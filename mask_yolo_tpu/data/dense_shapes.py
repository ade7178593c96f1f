"""Dense multi-class synthetic dataset — the 80-class quality fixture.

The BASELINE scale-out point (CocoStyleConfig: 81 classes, 416², MASK_TOP_K)
needs multi-class data with MANY instances per image to produce quality
evidence, but this sandbox has no network access to real COCO and the
reference repo ships no multi-class data at all (its VIA sets are
single-class, /root/reference/example/rice/rice_dataset.py:60-82). This
generator extends the Shapes fixture (reference dataset_shapes.py:53-180) to
that operating point:

  * class = index into a fixed `num_classes`-color palette (an RGB lattice
    with entries ≥ ~48 apart per channel); each instance is filled with its
    class's palette color plus small per-instance jitter (±12/channel), so
    the class is a crisp, learnable pixel signal — an earlier "color
    octant of a uniform-random color" scheme had so much intra-class
    variance that a from-scratch 25-epoch run scored AP ≈ 0 despite 0.41
    recall (docs/PERFORMANCE.md, r3);
  * scenes carry up to `max_instances` small shapes (default 48, well past
    CocoStyleConfig.MASK_TOP_K = 32, stressing the masks-for-top-K path);
  * same deterministic seeding, occlusion painting and GT-overlap pruning as
    the base Shapes generator.
"""

from __future__ import annotations

import numpy as np

from .dataset import non_max_suppression
from .shapes import ShapesDataset


def color_palette(n: int) -> np.ndarray:
    """[n, 3] uint8 palette on an RGB lattice (4×4×5 = 80 for n=80),
    channel values spread over [20, 215]/[20, 212] so neighboring entries
    differ by ≥ 48 in at least one channel — separable even under the
    ±12-per-channel instance jitter."""
    rs = np.linspace(20, 215, 4)
    gs = np.linspace(20, 215, 4)
    bs = np.linspace(20, 212, 5)
    grid = np.stack(np.meshgrid(rs, gs, bs, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    assert len(grid) >= n, f"palette lattice holds {len(grid)} < {n}"
    return grid[:n].astype(np.uint8)


class DenseShapesDataset(ShapesDataset):
    """80-class dense synthetic scenes. Usage:

        d = DenseShapesDataset()
        d.load_dense(count=400, height=416, width=416, seed=0)
        d.prepare()
    """

    JITTER = 12

    def class_of(self, shape: str, color) -> int:
        """Foreground class id (1-based): nearest palette entry (shape type
        does not enter the class — it varies freely within classes)."""
        d = np.abs(self._palette.astype(np.int32)
                   - np.asarray(color, np.int32)).sum(axis=1)
        return 1 + int(np.argmin(d))

    def load_dense(self, count, height=416, width=416, seed: int | None = 0,
                   num_classes: int = 80, min_instances: int = 24,
                   max_instances: int = 48):
        self._num_fg = int(num_classes)
        self._palette = color_palette(self._num_fg)
        rng = np.random.RandomState(seed) if seed is not None else np.random
        for i in range(1, self._num_fg + 1):
            self.add_class("dense_shapes", i, f"c{i:02d}")
        for i in range(count):
            bg_color, shapes = self._random_dense_image(
                height, width, rng, min_instances, max_instances)
            self.add_image(
                "dense_shapes",
                image_id=i,
                path=None,
                width=width,
                height=height,
                bg_color=bg_color,
                shapes=shapes,
            )

    def _random_dense_image(self, height, width, rng, lo, hi):
        # background stays away from palette colors: dark gray-ish noise
        bg_color = np.array([rng.randint(228, 256) for _ in range(3)])
        n = int(rng.randint(lo, hi + 1))
        shapes, boxes = [], []
        for _ in range(n):
            shape = self.SHAPE_NAMES[rng.randint(0, len(self.SHAPE_NAMES))]
            cls = int(rng.randint(0, self._num_fg))
            jit = rng.randint(-self.JITTER, self.JITTER + 1, size=3)
            color = tuple(int(v) for v in np.clip(
                self._palette[cls].astype(np.int32) + jit, 0, 255))
            # small instances (s = half-side): 10..36 px at 416² → 0.3..1.1
            # anchor grid units, matching CocoStyleConfig's smallest priors
            s = int(rng.randint(max(4, height // 42), max(8, height // 12)))
            y = int(rng.randint(s, height - s))
            x = int(rng.randint(s, width - s))
            shapes.append((shape, color, (x, y, s)))
            boxes.append([x - s, y - s, x + s, y + s])
        # prune only near-duplicates (0.5 keeps the scene dense; the base
        # Shapes generator prunes at 0.3, dataset_shapes.py:178)
        keep = non_max_suppression(np.array(boxes), np.arange(n), 0.5)
        shapes = [s for i, s in enumerate(shapes) if i in keep]
        return bg_color, shapes

    def load_mask(self, image_id):
        """Same occlusion-aware rasterization as Shapes, but class ids come
        from shape×color (dropping fully-occluded instances consistently)."""
        info = self.image_info[image_id]
        if info["source"] != "dense_shapes":
            return super().load_mask(image_id)
        shapes = info["shapes"]
        count = len(shapes)
        mask = np.zeros([info["height"], info["width"], count], dtype=np.uint8)
        for i, (shape, _, dims) in enumerate(shapes):
            mask[:, :, i:i + 1] = self.draw_shape(
                mask[:, :, i:i + 1].copy(), shape, dims, 1)
        occlusion = np.logical_not(mask[:, :, -1]).astype(np.uint8)
        for i in range(count - 2, -1, -1):
            mask[:, :, i] = mask[:, :, i] * occlusion
            occlusion = np.logical_and(occlusion,
                                       np.logical_not(mask[:, :, i]))
        class_ids = np.array(
            [self.class_of(s[0], s[1]) for s in shapes], dtype=np.int32)
        visible = mask.any(axis=(0, 1))
        return mask[:, :, visible].astype(bool), class_ids[visible]
