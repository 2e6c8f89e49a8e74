from approx_counter_tpu.io.logging import Log  # noqa: F401
from approx_counter_tpu.io.fastx import Reads, read_fastx  # noqa: F401
from approx_counter_tpu.io.export import export_counter, print_counters  # noqa: F401
