"""Named benchmark-dataset adapters on synthetic folders.

Counterpart of the reference's dataset registry (inference/utils.py:48-66 +
config.yml:1-24): each adapter reads the benchmark's folder convention; the
tests build a tiny synthetic copy of each layout and check eval_items().
"""

import numpy as np
import pytest

from sam_quantization_tpu.data import datasets as ds_lib

PIL = pytest.importorskip("PIL.Image")


def _write_img(path, arr):
    PIL.fromarray(arr.astype(np.uint8)).save(str(path))


def _rgb(h=24, w=32, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def _circle_mask(h=24, w=32, fg=255, ring=None):
    yy, xx = np.mgrid[:h, :w]
    d = (yy - h // 2) ** 2 + (xx - w // 2) ** 2
    m = np.zeros((h, w), np.uint8)
    m[d < 36] = fg
    if ring is not None:
        m[(d >= 36) & (d < 64)] = ring
    return m


def test_grabcut_layout(tmp_path):
    (tmp_path / "data_GT").mkdir()
    (tmp_path / "boundary_GT").mkdir()
    _write_img(tmp_path / "data_GT" / "a.png", _rgb())
    # trimap: 255 fg, 128 uncertain ring, 0 bg
    _write_img(tmp_path / "boundary_GT" / "a.png", _circle_mask(ring=128))
    ds = ds_lib.GrabCutDataset(str(tmp_path))
    items = list(ds.eval_items())
    assert len(items) == 1
    img, gt, _ = items[0]
    assert img.shape == (24, 32, 3)
    # only the 255 region is fg; the 128 ring maps to background
    assert gt.max() == 1 and gt.sum() == (_circle_mask() == 255).sum()


def test_berkeley_layout(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    _write_img(tmp_path / "images" / "b.png", _rgb(seed=1))
    _write_img(tmp_path / "masks" / "b.png", _circle_mask())
    ds = ds_lib.BerkeleyDataset(str(tmp_path))
    img, gt, _ = next(iter(ds.eval_items()))
    assert gt.sum() > 0


def test_davis_and_coco_mval_layout(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "gt").mkdir()
    for n in ("f0", "f1"):
        _write_img(tmp_path / "img" / f"{n}.png", _rgb(seed=2))
        _write_img(tmp_path / "gt" / f"{n}.png", _circle_mask())
    for cls in (ds_lib.DavisDataset, ds_lib.CocoMvalDataset):
        ds = cls(str(tmp_path))
        items = list(ds.eval_items())
        assert len(items) == 2
        assert all(gt.sum() > 0 for _, gt, _ in items)


def test_pascal_voc_layout(tmp_path):
    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "SegmentationObject").mkdir()
    sets = tmp_path / "ImageSets" / "Segmentation"
    sets.mkdir(parents=True)
    _write_img(tmp_path / "JPEGImages" / "v.jpg", _rgb(seed=3))
    inst = np.zeros((24, 32), np.uint8)
    inst[2:8, 2:8] = 1
    inst[10:20, 10:20] = 2
    inst[0, :] = 255  # VOC ignore boundary
    pal_img = PIL.fromarray(inst, mode="P")
    pal_img.putpalette([c for i in range(256) for c in (i, i, i)])
    pal_img.save(str(tmp_path / "SegmentationObject" / "v.png"))
    (sets / "val.txt").write_text("v\n")
    ds = ds_lib.PascalVocDataset(str(tmp_path), split="val")
    items = list(ds.eval_items())
    assert len(items) == 2  # two instances
    areas = sorted(int(gt.sum()) for _, gt, _ in items)
    assert areas == [36, 100]  # ignore row dropped


def test_get_dataset_registry(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "gt").mkdir()
    _write_img(tmp_path / "img" / "x.png", _rgb(seed=4))
    _write_img(tmp_path / "gt" / "x.png", _circle_mask())
    # explicit path override
    ds = ds_lib.get_dataset("DAVIS", str(tmp_path))
    assert isinstance(ds, ds_lib.DavisDataset)
    assert len(list(ds.eval_items())) == 1
    # registry path resolution from config defaults
    ds2 = ds_lib.get_dataset("COCO_MVal", str(tmp_path))
    assert isinstance(ds2, ds_lib.CocoMvalDataset)
    # unknown names return None (generic-folder fallback is the caller's)
    assert ds_lib.get_dataset("NotABenchmark", str(tmp_path)) is None


def test_get_dataset_sbd_train_default_path(tmp_path):
    """SBD_train resolves the shared SBD_PATH registry key (it has no
    SBD_TRAIN_PATH of its own — review round-5 finding: this KeyError'd)."""
    (tmp_path / "train.txt").write_text("")
    (tmp_path / "val.txt").write_text("")
    ds = ds_lib.get_dataset("SBD_train", cfg={"SBD_PATH": str(tmp_path)})
    assert isinstance(ds, ds_lib.SBDDataset)
    assert ds.split == "train"


def test_synthetic_hard_scenes():
    """'hard' style: deterministic, contract-identical to 'easy', with a
    non-empty target and multi-object scenes (distractor pixels exist that
    share the object color family but are NOT the target)."""
    from sam_quantization_tpu.data.synthetic import synthetic_samples

    a = list(synthetic_samples(4, 96, seed=11, style="hard"))
    b = list(synthetic_samples(4, 96, seed=11, style="hard"))
    for (ia, ga), (ib, gb) in zip(a, b):
        assert ia.shape == (1, 96, 96, 3) and ga.shape == (96, 96)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ga, gb)
        frac = ga.mean()
        assert 0.003 <= frac <= 0.5  # target present, not the whole image
    # differs from easy (same seed): hard scenes are a new distribution
    easy = next(iter(synthetic_samples(1, 96, seed=11, style="easy")))
    assert not np.array_equal(easy[0], a[0][0][None][0])
