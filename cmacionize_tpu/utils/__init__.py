from cmacionize_tpu.utils.units import parse_quantity, to_si, convert, Unit
from cmacionize_tpu.utils.params import ParameterFile
from cmacionize_tpu.utils.logging import Log, TerminalLog, FileLog

__all__ = [
    "parse_quantity",
    "to_si",
    "convert",
    "Unit",
    "ParameterFile",
    "Log",
    "TerminalLog",
    "FileLog",
]
