"""Pipeline systems: the System-facade equivalents per sensor configuration
(/root/reference/include/System.h:87-94 sensor enum)."""

from .system import MonoSlam, SlamConfig                      # noqa: F401
from .stereo_system import RgbdConfig, RgbdSlam, StereoConfig, StereoSlam  # noqa: F401
from .inertial_system import ImuConfig, MonoInertialSlam      # noqa: F401
from .stereo_inertial import StereoInertialSlam               # noqa: F401
