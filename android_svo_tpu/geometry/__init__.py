from android_svo_tpu.geometry.se3 import SE3, SO3
from android_svo_tpu.geometry.camera import PinholeCamera, ATANCamera
from android_svo_tpu.geometry import robust, triangulation

__all__ = ["SE3", "SO3", "PinholeCamera", "ATANCamera", "robust", "triangulation"]
