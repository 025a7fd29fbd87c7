"""Natural sort and split semantics (shared/pipeline.py:11-35,291-317)."""

import numpy as np
import pytest

from adunet.utils import sorted_alphanumeric, split_indices


def test_sorted_alphanumeric_numeric_order():
    items = ["img10.png", "img2.png", "img1.png", "IMG3.png"]
    assert sorted_alphanumeric(items) == ["img1.png", "img2.png", "IMG3.png", "img10.png"]
    # mixed digit-leading and letter-leading names must not raise (regression:
    # str-vs-int key comparison crashed discovery on e.g. DIV2K + a stray file)
    assert sorted_alphanumeric(["0801.png", "thumbnail.png", "0002.png"]) == [
        "0002.png", "0801.png", "thumbnail.png"
    ]


def test_split_indices_deterministic_and_disjoint():
    tr, va, te = split_indices(100, 0.8, 0.1, 0.1, seed=1234)
    tr2, va2, te2 = split_indices(100, 0.8, 0.1, 0.1, seed=1234)
    np.testing.assert_array_equal(tr, tr2)
    all_idx = np.concatenate([tr, va, te])
    assert len(set(all_idx.tolist())) == 100
    assert len(va) >= 1 and len(te) >= 1


def test_split_indices_guards():
    with pytest.raises(ValueError):
        split_indices(10, 0.0, 0.5, 0.5, seed=0)
    with pytest.raises(ValueError):
        split_indices(10, 0.8, -0.1, 0.1, seed=0)


def test_process_shard_single_process_identity():
    from adunet.parallel.distributed import process_seed, process_shard

    seq = list(range(7))
    assert process_shard(seq) == seq  # single process: unchanged
    assert process_seed(42) == 42


def test_process_shard_equal_lengths(monkeypatch):
    """Shards must have EQUAL lengths for any (len, n_processes): per-process
    steps_per_epoch derives from the local shard, and unequal step counts
    deadlock the per-step collectives. Verified here by faking the process
    topology; the real 2-process pinning lives in tests/test_multihost.py."""
    from adunet.parallel import distributed

    for n in (2, 3, 4):
        shards = []
        monkeypatch.setattr(distributed.jax, "process_count", lambda: n)
        for pid in range(n):
            monkeypatch.setattr(distributed.jax, "process_index", lambda p=pid: p)
            shards.append(distributed.process_shard(list(range(10))))
        assert len({len(s) for s in shards}) == 1  # equal lengths
        # when n divides the count, shards are the plain disjoint stride-slices
        if 10 % n == 0:
            assert sorted(x for s in shards for x in s) == sorted(range(10))
        # every global item appears in some shard
        assert {x for s in shards for x in s} == set(range(10))

    # fewer items than processes: recycle rather than hand out empty shards
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    monkeypatch.setattr(distributed.jax, "process_index", lambda: 3)
    assert distributed.process_shard(["only"]) == ["only"]
    assert distributed.process_shard([]) == []


def test_console_entry_points_resolve():
    """Every [project.scripts] target in pyproject.toml must import and be
    callable — guards the packaging contract against CLI renames."""
    import importlib
    import re
    from pathlib import Path

    toml = (Path(__file__).resolve().parents[1] / "pyproject.toml").read_text()
    block = toml.split("[project.scripts]", 1)[1].split("[", 1)[0]
    targets = re.findall(r'=\s*"([\w.]+):(\w+)"', block)
    assert len(targets) == 16, targets
    for mod_name, fn_name in targets:
        fn = getattr(importlib.import_module(mod_name), fn_name)
        assert callable(fn), (mod_name, fn_name)


def test_sr_config_validation_guards():
    """Pin the SRTrainConfig argument guards (flag-parity with the reference
    trainer's own validation, train_adaptive_unet.py:383-404): each bad value
    must raise with a message naming the field."""
    import pytest

    from adunet.configs import SRTrainConfig

    def ok(**kw):
        kw.setdefault("scale", 0.5)
        cfg = SRTrainConfig(**kw)
        cfg.validate()  # guards live in validate(), invoked by the CLI
        return cfg

    ok()  # the baseline config is valid

    bad = [
        (dict(scale=0.0), "scale"),
        (dict(scale=1.0), "scale"),
        (dict(patch_size=0), "patch_size"),
        (dict(patches_per_image=0), "patches_per_image"),
        (dict(eval_stride=0), "eval_stride"),
        (dict(shuffle_buffer=-1), "shuffle_buffer"),
        (dict(max_depth=0), "max_depth"),
        (dict(initial_epoch=-1), "initial_epoch"),
        (dict(initial_epoch=100), "initial_epoch"),   # >= epochs (default 100)
        (dict(grad_accum=0), "grad_accum"),
        (dict(grad_accum=3, batch_size=4), "grad_accum"),
        (dict(val_split=-0.1), "val_split"),
        (dict(val_split=0.6, test_split=0.5), "val_split"),
    ]
    for kw, needle in bad:
        with pytest.raises(ValueError, match=needle):
            ok(**kw)


def test_seg_config_protocol_resolution():
    """resolved() must apply the protocol preset only where the user left the
    field at its sentinel (0 / None) — explicit overrides always win
    (reference protocol table, Segmenation trainer :370-403)."""
    import pytest

    from adunet.configs import PROTOCOLS, SegTrainConfig

    a = SegTrainConfig(protocol="A").resolved()
    assert (a.epochs, a.batch_size, a.patience) == (
        PROTOCOLS["A"].epochs, PROTOCOLS["A"].batch_size,
        PROTOCOLS["A"].early_stopping_patience,
    )

    # explicit values survive resolution, including patience=0 (not None)
    o = SegTrainConfig(protocol="B", epochs=7, batch_size=2, patience=0).resolved()
    assert (o.epochs, o.batch_size, o.patience) == (7, 2, 0)

    with pytest.raises(KeyError):
        SegTrainConfig(protocol="Z").resolved()


def test_seg_val_device_cache_flag():
    """--no_val_device_cache must reach the config (the val set becomes
    device-resident by default; large val sets need the opt-out)."""
    from adunet.cli.train_seg import config_from_args, parse_args

    req = ["--train_images", "a", "--train_masks", "b",
           "--val_images", "c", "--val_masks", "d"]
    assert config_from_args(parse_args(req)).val_device_cache is True
    off = config_from_args(parse_args(req + ["--no_val_device_cache"]))
    assert off.val_device_cache is False
