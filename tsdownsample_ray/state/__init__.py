"""Engine state: checkpoint manifests and lineage."""
