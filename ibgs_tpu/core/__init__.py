from ibgs_tpu.core import transforms, sh
from ibgs_tpu.core.camera import Camera
