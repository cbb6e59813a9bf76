"""Native (C++) host-side runtime components, bound via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-numpy fallback so the framework works without a
toolchain. Enable/disable with VITSLAM_NATIVE=1/0 (default: on when a
compiler succeeds)."""
from .bindings import (
    depth_to_points_native,
    lidar_splat_depth_native,
    native_available,
)

__all__ = [
    "depth_to_points_native", "lidar_splat_depth_native", "native_available",
]
