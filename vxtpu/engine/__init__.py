from vxtpu.engine.platform import platform_info, validate_platform, enable_compilation_cache

__all__ = ["platform_info", "validate_platform", "enable_compilation_cache"]
