"""L2 core: geometry kernels, scene data model, synthetic fixtures."""
