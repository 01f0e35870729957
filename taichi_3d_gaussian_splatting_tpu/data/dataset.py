"""Image+pose dataset and host-side prefetching loader.

Torch-free rebuild of the reference's `ImagePoseDataset`
(reference: ImagePoseDataset.py): a JSON-of-records table with columns
`image_path, T_pointcloud_camera, camera_intrinsics, camera_height,
camera_width, camera_id`; per item it loads a PNG, rescales intrinsics to the
actual image size, crops H/W down to tile multiples, converts the SE(3) pose
to (q, t), and autoscales anything over 1600 px (reference: :40-96).

The reference parallelizes decode with `DataLoader(num_workers=4)`
(reference: GaussianPointTrainer.py:120-123); here a thread-pool
`PrefetchLoader` overlaps PIL decode with TPU steps (PIL releases the GIL
during decode/resize).
"""

from __future__ import annotations

import concurrent.futures
import threading
from typing import NamedTuple, Optional

import numpy as np
import PIL.Image

from ..camera import CameraInfo, TILE_WIDTH, TILE_HEIGHT
from ..ops import transforms as T

MAX_RESOLUTION_TRAIN = 1600  # reference: ImagePoseDataset.py:13
_AUTOSCALE_SHORT_SIDE = 1024


class DatasetItem(NamedTuple):
    image: np.ndarray  # (H, W, 3) float32 in [0, 1]
    q_pointcloud_camera: np.ndarray  # (1, 4)
    t_pointcloud_camera: np.ndarray  # (1, 3)
    camera_info: CameraInfo


def _se3_to_qt(T_pointcloud_camera: np.ndarray):
    import jax.numpy as jnp
    q, t = T.SE3_to_quaternion_and_translation(
        jnp.asarray(T_pointcloud_camera, jnp.float32)[None])
    return np.asarray(q), np.asarray(t)


def _resize_image(image: PIL.Image.Image, height: int, width: int):
    return image.resize((width, height), PIL.Image.BILINEAR)


def autoscale_image_and_camera_info(image: np.ndarray,
                                    camera_info: CameraInfo):
    """Downscale >1600px images to short side 1024 (long side <= 1600) with
    intrinsics rescale and tile-multiple crop (reference: :40-62)."""
    h, w = camera_info.camera_height, camera_info.camera_width
    if h <= MAX_RESOLUTION_TRAIN and w <= MAX_RESOLUTION_TRAIN:
        return image, camera_info
    # torchvision resize(size=1024, max_size=1600) semantics
    short, long = min(h, w), max(h, w)
    scale = _AUTOSCALE_SHORT_SIDE / short
    if long * scale > MAX_RESOLUTION_TRAIN:
        scale = MAX_RESOLUTION_TRAIN / long
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    pil = PIL.Image.fromarray((image * 255.0).astype(np.uint8))
    image = np.asarray(_resize_image(pil, new_h, new_w),
                       np.float32) / 255.0
    scale_x = new_w / w
    scale_y = new_h / h
    crop_h = new_h - new_h % TILE_HEIGHT
    crop_w = new_w - new_w % TILE_WIDTH
    image = np.ascontiguousarray(image[:crop_h, :crop_w, :3])
    intr = np.array(camera_info.camera_intrinsics, np.float32).copy()
    intr[0, :] *= scale_x
    intr[1, :] *= scale_y
    return image, CameraInfo(camera_intrinsics=intr, camera_height=crop_h,
                             camera_width=crop_w,
                             camera_id=camera_info.camera_id)


class ImagePoseDataset:
    def __init__(self, dataset_json_path: str):
        import pandas as pd
        required = ["image_path", "T_pointcloud_camera", "camera_intrinsics",
                    "camera_height", "camera_width", "camera_id"]
        self.df = pd.read_json(dataset_json_path, orient="records")
        for column in required:
            assert column in self.df.columns, \
                f"column {column} is not in the dataset"

    def __len__(self):
        return len(self.df)

    def __getitem__(self, idx) -> DatasetItem:
        row = self.df.iloc[idx]
        T_pc_cam = np.array(row["T_pointcloud_camera"],
                            np.float32).reshape(4, 4)
        q, t = _se3_to_qt(T_pc_cam)
        intr = np.array(row["camera_intrinsics"], np.float32).reshape(3, 3)
        base_h = float(row["camera_height"])
        base_w = float(row["camera_width"])
        camera_id = int(row["camera_id"])

        image = PIL.Image.open(row["image_path"])
        arr = np.asarray(image, np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        h, w = arr.shape[0], arr.shape[1]
        # rescale intrinsics to the real image size (reference: :77-83)
        intr = intr.copy()
        intr[0, :] *= w / base_w
        intr[1, :] *= h / base_h
        # crop to tile multiples (reference: :84-88)
        crop_h = h - h % TILE_HEIGHT
        crop_w = w - w % TILE_WIDTH
        arr = np.ascontiguousarray(arr[:crop_h, :crop_w, :3])
        camera_info = CameraInfo(camera_intrinsics=intr,
                                 camera_height=crop_h, camera_width=crop_w,
                                 camera_id=camera_id)
        arr, camera_info = autoscale_image_and_camera_info(arr, camera_info)
        return DatasetItem(arr, q, t, camera_info)


class PrefetchLoader:
    """Thread-pool prefetcher: keeps `prefetch` decoded items in flight."""

    def __init__(self, dataset: ImagePoseDataset, shuffle: bool = True,
                 num_workers: int = 4, prefetch: int = 8,
                 seed: int = 0, loop: bool = True):
        self.dataset = dataset
        self.shuffle = shuffle
        self.loop = loop
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.pool = concurrent.futures.ThreadPoolExecutor(num_workers)
        self._lock = threading.Lock()
        self._order = []
        self._pos = 0

    def _next_index(self) -> Optional[int]:
        with self._lock:
            if self._pos >= len(self._order):
                if self._order and not self.loop:
                    return None
                order = np.arange(len(self.dataset))
                if self.shuffle:
                    self.rng.shuffle(order)
                self._order = order.tolist()
                self._pos = 0
            idx = self._order[self._pos]
            self._pos += 1
            return idx

    def __iter__(self):
        queue = []
        for _ in range(self.prefetch):
            idx = self._next_index()
            if idx is None:
                break
            queue.append(self.pool.submit(self.dataset.__getitem__, idx))
        while queue:
            item = queue.pop(0).result()
            idx = self._next_index()
            if idx is not None:
                queue.append(self.pool.submit(self.dataset.__getitem__, idx))
            yield item
