from cmacionize_tpu.io.gadget import write_gadget_snapshot, read_gadget_snapshot  # noqa: F401
from cmacionize_tpu.io.restart import RestartManager  # noqa: F401
