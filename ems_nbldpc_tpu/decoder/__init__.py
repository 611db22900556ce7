from .api import DecoderConfig, decode, DeviceGraph  # noqa: F401
