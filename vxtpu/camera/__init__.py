from vxtpu.camera.camera import Camera
from vxtpu.camera.rays import generate_rays

__all__ = ["Camera", "generate_rays"]
