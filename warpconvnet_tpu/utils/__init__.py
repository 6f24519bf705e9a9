from warpconvnet_tpu.utils.logger import get_logger
from warpconvnet_tpu.utils.timer import DeviceTimer, time_fn

__all__ = ["get_logger", "DeviceTimer", "time_fn"]
