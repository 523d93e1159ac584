from cmhse_tpu.utils.logging import AverageMeter, LogCollector, JsonlLogger
from cmhse_tpu.utils.timing import Timer, throughput

__all__ = ["AverageMeter", "LogCollector", "JsonlLogger", "Timer", "throughput"]
