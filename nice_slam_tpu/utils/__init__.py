"""Host-side services: datasets, synthetic scenes, checkpointing,
trajectory metrics, meshing, visualization, profiling."""
