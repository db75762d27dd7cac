from vxtpu.app.configs import CONFIGS, SceneConfig

__all__ = ["CONFIGS", "SceneConfig"]
