"""End-to-end pipelines: the flagship rollup/downsample/retention run and
the driver-facing query catalog."""
