from .base import BaseDataset, CommonConfig
from .preprocess import (
    depth_to_points,
    get_target_shape,
    process_one_image,
    read_image_cv2,
    resize_crop_image,
    threshold_depth_map,
)
from .vkitti import VKittiDataset
from .kitti_odometry import KITTIOdometryDataset
from .waymo import WaymoDataset, lidar_to_depth
from .dynamic import ComposedDataset, DynamicDataset, collate

__all__ = [
    "BaseDataset", "CommonConfig", "depth_to_points", "get_target_shape",
    "process_one_image", "read_image_cv2", "resize_crop_image",
    "threshold_depth_map", "VKittiDataset", "KITTIOdometryDataset",
    "WaymoDataset", "lidar_to_depth", "ComposedDataset", "DynamicDataset",
    "collate",
]
