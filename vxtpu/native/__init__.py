from vxtpu.native.oracle import march_native, native_available

__all__ = ["march_native", "native_available"]
