from vxtpu.render.settings import RenderSettings

__all__ = ["RenderSettings"]
