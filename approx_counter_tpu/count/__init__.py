from approx_counter_tpu.count.exact import exact_count_select  # noqa: F401
