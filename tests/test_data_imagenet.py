"""ImageNet-family data pipeline (data/imagenet.py)."""

import numpy as np

from quantized_distillation_tpu.data import load_imagenet


class TestImagenet:
    def test_synthetic_deterministic_shared_task(self):
        a = load_imagenet(True, data_dir="/nonexistent", image_size=32,
                          num_classes=7, synthetic_size=64, seed=3)
        b = load_imagenet(True, data_dir="/nonexistent", image_size=32,
                          num_classes=7, synthetic_size=64, seed=3)
        assert a.source == "synthetic"
        assert a.images.shape == (64, 32, 32, 3)
        np.testing.assert_array_equal(a.images, b.images)
        # val split: different samples, same class templates (same task)
        v = load_imagenet(False, data_dir="/nonexistent", image_size=32,
                          num_classes=7, synthetic_size=64, seed=3)
        assert not np.array_equal(a.images, v.images)

    def test_disk_npy_pack(self, tmp_path):
        x = (np.random.default_rng(0).integers(0, 256, (10, 16, 16, 3))
             .astype(np.uint8))
        y = np.arange(1, 11, dtype=np.int64)  # 1-based like Imagenet64
        np.save(tmp_path / "train_images.npy", x)
        np.save(tmp_path / "train_labels.npy", y)
        ds = load_imagenet(True, data_dir=str(tmp_path))
        assert ds.source == "disk"
        assert ds.images.shape == (10, 16, 16, 3)
        assert ds.labels.min() == 0 and ds.num_classes == 10
        assert ds.images.dtype == np.float32
