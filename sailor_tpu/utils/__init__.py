from sailor_tpu.utils.log import SAILOR_LOG, get_log_messages
from sailor_tpu.utils import profiler

__all__ = ["SAILOR_LOG", "get_log_messages", "profiler"]
