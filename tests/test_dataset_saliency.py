"""PublicDataset loader + prompts + saliency op coverage."""

import csv
import os

import numpy as np
import pytest

from tee_optical_flow_tpu.ops.saliency import fine_grained_saliency
from tee_optical_flow_tpu.train.data import PublicDataset, batch_iterator


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture()
def image_dataset(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rows = []
    for i in range(4):
        img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        if i != 3:  # sample 3 has an empty mask -> filter_empty drops it
            mask[8:20, 8:20] = 1
        _write_png(str(img_dir / f"im{i}.png"), img)
        _write_png(str(mask_dir / f"m{i}.png"), mask)
        rows.append((f"im{i}.png", f"m{i}.png"))
    list_path = tmp_path / "list.csv"
    with open(list_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(img_dir), str(mask_dir), str(list_path)


def test_public_dataset_loading(image_dataset):
    img_dir, mask_dir, list_path = image_dataset
    ds = PublicDataset(img_dir, mask_dir, list_path, phase="val",
                       image_size=64, out_size=16)
    assert len(ds) == 4
    sample = ds[0]
    assert sample["image"].shape == (64, 64, 3)
    assert sample["mask"].shape == (16, 16)
    assert sample["mask"].max() == 1
    # SAM normalization applied (values not in [0, 1])
    assert sample["image"].min() < -0.5


def test_public_dataset_filter_and_augment(image_dataset):
    img_dir, mask_dir, list_path = image_dataset
    ds = PublicDataset(img_dir, mask_dir, list_path, phase="train",
                       image_size=32, out_size=16).filter_empty()
    assert len(ds) == 3  # empty-mask row dropped
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)


def test_public_dataset_prompts(image_dataset):
    img_dir, mask_dir, list_path = image_dataset
    for ptype, key in (("point", "point"), ("box", "boxes")):
        ds = PublicDataset(img_dir, mask_dir, list_path, phase="val",
                           image_size=32, out_size=16, if_prompt=True,
                           prompt_type=ptype)
        s = ds[0]
        assert key in s
        if ptype == "point":
            x, y = s["point"][0]
            assert s["point_label"][0] == 1.0
            assert 0 <= x < 32 and 0 <= y < 32
        else:
            x0, y0, x1, y1 = s["boxes"][0]
            assert x0 <= x1 and y0 <= y1


def test_batch_iterator(image_dataset):
    img_dir, mask_dir, list_path = image_dataset
    ds = PublicDataset(img_dir, mask_dir, list_path, phase="val",
                       image_size=32, out_size=16)
    batches = list(batch_iterator(ds, 2, shuffle=True, drop_last=True))
    assert len(batches) == 2
    imgs, masks = batches[0]
    assert imgs.shape == (2, 32, 32, 3) and masks.shape == (2, 16, 16)


def test_fine_grained_saliency(rng):
    frames = rng.uniform(size=(2, 32, 32)).astype(np.float32)
    # plant a bright blob: saliency should peak near it
    frames[0, 14:18, 14:18] += 3.0
    sal = np.asarray(fine_grained_saliency(frames))
    assert sal.shape == frames.shape
    assert sal.min() >= 0.0 and sal.max() <= 1.0
    yx = np.unravel_index(np.argmax(sal[0]), sal[0].shape)
    assert 10 <= yx[0] <= 22 and 10 <= yx[1] <= 22
