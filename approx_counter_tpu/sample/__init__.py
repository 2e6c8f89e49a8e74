from approx_counter_tpu.sample.sampler import WindowBatch, sample_windows  # noqa: F401
