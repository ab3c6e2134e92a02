"""Host pipeline tests: Loader shuffling/padding, CRD instance sampler,
manifest preparers on a synthetic file tree, packed cache round trip."""

import os

import numpy as np
import pytest

from moma_tpu.data.pipeline import ArrayDataset, Loader, synthetic_dataset
from moma_tpu.data.sampler import InstanceSampler


def test_loader_train_reshuffles_per_epoch():
    ds = synthetic_dataset(40, 8, 4, seed=0)
    loader = Loader(ds, batch_size=8, train=True, seed=1)
    loader.set_epoch(0)
    order0 = np.concatenate([b["index"] for b in loader])
    loader.set_epoch(1)
    order1 = np.concatenate([b["index"] for b in loader])
    assert not np.array_equal(order0, order1)
    loader.set_epoch(0)
    order0b = np.concatenate([b["index"] for b in loader])
    np.testing.assert_array_equal(order0, order0b)  # deterministic per epoch


def test_loader_train_drops_last():
    ds = synthetic_dataset(42, 8, 4, seed=0)
    loader = Loader(ds, batch_size=8, train=True)
    assert len(loader) == 5
    for b in loader:
        assert b["image"].shape[0] == 8


def test_loader_eval_pads_tail_with_mask():
    ds = synthetic_dataset(20, 8, 4, seed=0)
    loader = Loader(ds, batch_size=8, train=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["mask"].sum() == 4
    assert batches[-1]["image"].shape[0] == 8
    total_valid = sum(b["mask"].sum() for b in batches)
    assert total_valid == 20


def test_instance_sampler_exact_mode():
    labels = np.asarray([0, 0, 1, 1, 2, 2, 2])
    s = InstanceSampler(labels, k=4, mode="exact", seed=0)
    idx = np.asarray([0, 3, 6])
    out = s.sample(idx)
    assert out.shape == (3, 5)
    np.testing.assert_array_equal(out[:, 0], idx)  # positive = anchor
    for b in range(3):
        neg_labels = labels[out[b, 1:]]
        assert (neg_labels != labels[idx[b]]).all()


def test_instance_sampler_relax_mode():
    labels = np.asarray([0] * 5 + [1] * 5)
    s = InstanceSampler(labels, k=3, mode="relax", seed=0)
    out = s.sample(np.asarray([0, 7]))
    assert labels[out[0, 0]] == 0 and labels[out[1, 0]] == 1
    assert (labels[out[0, 1:]] == 1).all()
    assert (labels[out[1, 1:]] == 0).all()


def test_manifest_prostate_hv(tmp_path):
    from moma_tpu.data.manifests import prepare_prostate_hv

    # synthetic file tree matching the reference's naming convention
    for split, slide in [
        ("patches_train_750_v0", "ZT111_1"),
        ("patches_train_750_v0", "ZT199_2"),
        ("patches_validation_750_v0", "ZT76_1"),
    ]:
        d = tmp_path / split / slide
        d.mkdir(parents=True)
        for i, label in enumerate([0, 1, 3]):
            (d / f"patch_{i}_{label}.jpg").write_bytes(b"x")
    t = tmp_path / "patches_test_750_v0" / "patho_1" / "case1"
    t.mkdir(parents=True)
    (t / "p_0_2.jpg").write_bytes(b"x")

    train, valid, test = prepare_prostate_hv(str(tmp_path))
    assert len(train) == 6 and len(valid) == 3 and len(test) == 1
    assert sorted({l for _, l in train}) == [0, 1, 3]
    assert test[0][1] == 2


def test_stratified_kfold():
    from moma_tpu.data.manifests import stratified_kfold

    pairs = [(f"f{i}.jpg", i % 3) for i in range(30)]
    seen_valid = set()
    for fold in range(5):
        train, valid = stratified_kfold(pairs, fold, n_folds=5)
        assert len(train) + len(valid) == 30
        assert len(valid) == 6
        # stratification: each class appears in valid
        assert {l for _, l in valid} == {0, 1, 2}
        seen_valid |= {p for p, _ in valid}
        assert not ({p for p, _ in train} & {p for p, _ in valid})
    assert len(seen_valid) == 30  # folds partition the data


def test_two_view_augment_distinct_views():
    import jax

    from moma_tpu.core.config import Config
    from moma_tpu.data.histo_augment import make_two_view_augment

    cfg = Config()
    cfg.data.image_size = 32
    cfg.data.aug_train = "RA"
    cfg.data.image_resize = False
    aug = make_two_view_augment(cfg)
    imgs = np.random.RandomState(0).randint(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    v1, v2 = aug(imgs, jax.random.PRNGKey(0))
    assert v1.shape == v2.shape == (4, 32, 32, 3)
    assert float(abs(np.asarray(v1) - np.asarray(v2)).sum()) > 0


def test_imagefolder_manifest(tmp_path):
    from moma_tpu.data.manifests import prepare_imagefolder

    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(3 if split == "train" else 1):
                (d / f"img_{i}.jpg").write_bytes(b"x")
    train, val, test = prepare_imagefolder(str(tmp_path))
    assert len(train) == 6 and len(val) == 2
    assert {l for _, l in train} == {0, 1}
    # alphabetical class mapping: cat=0, dog=1
    assert all(l == 0 for p, l in train if "/cat/" in p)


def test_packed_cache_roundtrip(tmp_path):
    from PIL import Image

    from moma_tpu.data.histo import PackedCache

    rs = np.random.RandomState(0)
    pairs = []
    for i in range(5):
        arr = rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}_{i % 3}.png"
        Image.fromarray(arr).save(p)
        pairs.append((str(p), i % 3))
    cache = PackedCache(str(tmp_path / "cache"))
    ds = cache.build_or_open(pairs, size=16)
    assert len(ds) == 5
    np.testing.assert_array_equal(ds.labels, [0, 1, 2, 0, 1])
    # decode parity for the first image (no resize: stored size == source)
    with Image.open(pairs[0][0]) as im:
        np.testing.assert_array_equal(ds.images[0], np.asarray(im.convert("RGB")))
    # reopening hits the cache (no rebuild): same bytes
    ds2 = cache.build_or_open(pairs, size=16)
    np.testing.assert_array_equal(np.asarray(ds.images), np.asarray(ds2.images))


def test_loader_native_prefetch_matches_numpy(tmp_path):
    """Train Loader over a packed (bin_path) dataset must yield identical
    batches whether the native C++ prefetcher or numpy assembles them."""
    from moma_tpu.data.native import get_lib

    if get_lib() is None:
        import pytest as _pytest

        _pytest.skip("no g++")
    rs = np.random.RandomState(0)
    n, s = 40, 8
    data = rs.randint(0, 256, (n, s, s, 3), dtype=np.uint8)
    bin_path = str(tmp_path / "pack.bin")
    with open(bin_path, "wb") as f:
        f.write(data.tobytes())
    images = np.memmap(bin_path, dtype=np.uint8, mode="r", shape=(n, s, s, 3))
    labels = np.arange(n) % 4
    ds_native = ArrayDataset(images, labels, bin_path=bin_path)
    ds_plain = ArrayDataset(data, labels)
    l1 = Loader(ds_native, batch_size=8, train=True, seed=3)
    l2 = Loader(ds_plain, batch_size=8, train=True, seed=3)
    l1.set_epoch(1)
    l2.set_epoch(1)
    for b1, b2 in zip(l1, l2):
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["label"], b2["label"])


def _mini_imagefolder(tmp_path, n_per_class=10, classes=("cat", "dog")):
    from PIL import Image

    rs = np.random.RandomState(7)
    for cls in classes:
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(n_per_class):
            arr = rs.randint(0, 256, (8, 8, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    v = tmp_path / "val" / classes[0]
    v.mkdir(parents=True)
    Image.fromarray(rs.randint(0, 256, (8, 8, 3), np.uint8)).save(v / "v0.png")


def test_load_histo_dataset_kfold(tmp_path):
    """--fold_idx re-splits the train+val POOL via stratified k-fold
    (the reference's 5-fold loader capability, histo_dataset.py:848-1035)
    while the test split stays the dataset's native held-out set."""
    from moma_tpu.core.config import DataConfig
    from moma_tpu.data.histo import load_histo_dataset

    _mini_imagefolder(tmp_path)
    pool_n = 21  # 2x10 train + 1 val

    seen_val_sizes = []
    for fold in range(5):
        cfg = DataConfig(dataset="imagefolder", data_dir=str(tmp_path),
                         image_size=8, fold_idx=fold, n_folds=5)
        train, val, test = load_histo_dataset(cfg)
        assert len(train) + len(val) == pool_n
        seen_val_sizes.append(len(val))
        # the native test split is untouched by folding (imagefolder's
        # test == its val dir: 1 file)
        assert len(test) == 1
    assert sum(seen_val_sizes) == pool_n  # folds partition the pool

    # fold_idx=-1 keeps the native splits
    cfg = DataConfig(dataset="imagefolder", data_dir=str(tmp_path),
                     image_size=8)
    train, val, test = load_histo_dataset(cfg)
    assert len(train) == 20 and len(val) == 1


def test_fold_flag_rejected_on_synthetic():
    from moma_tpu.core.config import parse_teacher_args
    from moma_tpu.train.teacher import build_datasets

    cfg = parse_teacher_args(
        ["--fold_idx", "2", "--dataset", "synthetic", "--n_cls", "4"]
    )
    assert cfg.data.fold_idx == 2 and cfg.data.n_folds == 5
    with pytest.raises(ValueError, match="fold_idx"):
        build_datasets(cfg, synthetic=True)


def test_fold_flag_validation():
    from moma_tpu.core.config import parse_teacher_args

    with pytest.raises(ValueError, match="out of range"):
        parse_teacher_args(["--fold_idx", "5", "--n_folds", "5"])
    with pytest.raises(ValueError, match="n_folds"):
        parse_teacher_args(["--fold_idx", "0", "--n_folds", "1"])
    cfg = parse_teacher_args(["--fold_idx", "3"])
    assert "fold3of5" in cfg.run_name


def test_load_histo_testset_standard_dataset_fallback(tmp_path):
    """test_eval on a STANDARD dataset evaluates its held-out test split
    (the reference test.py's main mode) — r5 regression: this KeyError'd
    for prostate_hv because only TEST_ONLY_PREPARERS was consulted
    (caught live by the canonical-lifecycle eval leg)."""
    from PIL import Image

    from moma_tpu.data.histo import load_histo_testset

    rs = np.random.RandomState(0)
    d = tmp_path / "patches_train_750_v0" / "ZT111_1"
    d.mkdir(parents=True)
    for i in range(2):
        Image.fromarray(rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                        ).save(d / f"patch_{i}_{i}.jpg")
    t = tmp_path / "patches_test_750_v0" / "patho_1" / "case1"
    t.mkdir(parents=True)
    for i, lbl in enumerate([2, 3, 1]):
        Image.fromarray(rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                        ).save(t / f"p_{i}_{lbl}.jpg")

    ds = load_histo_testset("prostate_hv", str(tmp_path), 16)
    assert len(ds) == 3
    assert sorted(ds.labels.tolist()) == [1, 2, 3]

    with pytest.raises(KeyError, match="unknown eval dataset"):
        load_histo_testset("nope", str(tmp_path), 16)
