"""Data pipeline tests: letterbox, transforms, mosaic wrapper."""
import numpy as np

from unicorn_tpu.data.mosaic import MosaicDetection
from unicorn_tpu.data.preproc import letterbox
from unicorn_tpu.data.transforms import TrainTransform, TrainTransformOmni, ValTransform


class FakeDetDataset:
    """In-memory detection dataset with one centered box per image."""

    def __init__(self, n=10, h=120, w=160, seed=0):
        self.rng = np.random.RandomState(seed)
        self.n = n
        self.h, self.w = h, w

    def __len__(self):
        return self.n

    def pull_item(self, idx):
        img = (self.rng.rand(self.h, self.w, 3) * 255).astype(np.uint8)
        res = np.array([[20, 30, 80, 90, idx % 5]], np.float32)  # xyxy cls
        return img, res, (self.h, self.w), np.array([idx])


def test_letterbox_scale_and_padding():
    img = np.full((100, 200, 3), 50, np.uint8)
    out, r = letterbox(img, (128, 128))
    assert out.shape == (128, 128, 3)
    assert abs(r - 128 / 200) < 1e-9
    # content occupies top rows, padding is 114
    assert (out[:64, :, :] == 50).all()
    assert (out[70:, :, :] == 114).all()


def test_train_transform_label_format():
    ds = FakeDetDataset()
    tf = TrainTransform(max_labels=10, flip_prob=0.0, hsv_prob=0.0)
    img, res, _, _ = ds.pull_item(3)
    out_img, labels = tf(img, res, (128, 128))
    assert out_img.shape == (128, 128, 3)
    assert labels.shape == (10, 5)
    # one valid label [cls, cx, cy, w, h] scaled by r
    valid = labels[np.abs(labels).sum(1) > 0]
    assert len(valid) == 1
    r = min(128 / 120, 128 / 160)
    np.testing.assert_allclose(valid[0, 1:], np.array([50, 60, 60, 60]) * r,
                               rtol=1e-5)
    assert valid[0, 0] == 3 % 5


def test_omni_transform_joint_flip_consistency():
    tf = TrainTransformOmni(max_labels=5, hsv_prob=0.0)
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
    res = np.array([[10, 10, 50, 50, 0]], np.float32)
    _, lab_noflip = tf(img.copy(), res.copy(), (128, 128), joint=True, flip=False)
    _, lab_flip = tf(img.copy(), res.copy(), (128, 128), joint=True, flip=True)
    # SOT labels get tid=1 on their single instance
    assert lab_noflip[0, 5] == 1.0
    r = 1.28
    assert abs(lab_noflip[0, 1] - 30 * r) < 1e-3
    assert abs(lab_flip[0, 1] - (100 - 30) * r) < 1e-3


def test_mosaic_detection():
    ds = FakeDetDataset(n=8)
    tf = TrainTransform(max_labels=50, flip_prob=0.0, hsv_prob=0.0)
    mosaic = MosaicDetection(ds, (128, 128), tf, mosaic_prob=1.0,
                             mixup_prob=1.0)
    img, labels, _, _ = mosaic[0]
    assert img.shape == (128, 128, 3)
    assert labels.shape == (50, 5)
    # mosaic off -> plain path
    mosaic.close_mosaic()
    img2, labels2, _, _ = mosaic[0]
    assert img2.shape == (128, 128, 3)
    n_valid = (np.abs(labels2).sum(1) > 0).sum()
    assert n_valid == 1


def test_letterbox_device_matches_host():
    import jax.numpy as jnp

    from unicorn_tpu.ops.letterbox import letterbox_device

    rng = np.random.RandomState(0)
    img = (rng.rand(100, 200, 3) * 255).astype(np.uint8)
    host, r_host = letterbox(img, (128, 128))
    dev, r_dev = letterbox_device(jnp.asarray(img), (100, 200), (128, 128))
    assert abs(r_host - r_dev) < 1e-9
    # padding identical, content within rounding of cv2's uint8 quantization
    np.testing.assert_allclose(np.asarray(dev)[70:], host[70:])
    diff = np.abs(np.asarray(dev)[:64] - host[:64])
    assert diff.mean() < 1.0 and diff.max() <= 2.0
