"""irf_offline: 3D offline tracer transport driven by IRF circulation files,
integrated entirely on device -- the cime_pop-scale workload without the
external ocean model."""
