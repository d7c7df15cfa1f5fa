"""Ray Data pipeline stages (stateless map_batches transforms, groupby
stages, and stateful actor-pool stages)."""
