"""Unit tests for host-side training-loop policy pieces."""

from pathlib import Path

from tinynerf_tpu.train import TrainConfig
from tinynerf_tpu.train.loop import pick_bucket


def cfg(**kw):
    base = dict(method="kplanes", output=Path("/tmp/x"), batch_size=2048, n_samples=400)
    base.update(kw)
    return TrainConfig(**base)


def test_pick_bucket_all_occupied():
    # everything survives: demand per candidate ray = n_samples -> bucket 1
    assert pick_bucket(cfg(), avg_samples_per_ray=400.0) == 1


def test_pick_bucket_converged():
    # ~25 samples/ray -> 16x more candidate rays fit the cap
    assert pick_bucket(cfg(), avg_samples_per_ray=25.0) == 16


def test_pick_bucket_intermediate():
    # 80 samples/ray -> want = 400/80 = 5 -> bucket 4
    assert pick_bucket(cfg(), avg_samples_per_ray=80.0) == 4


def test_pick_bucket_degenerate():
    c = cfg()
    assert pick_bucket(c, avg_samples_per_ray=0.0) == max(c.ray_buckets)
    assert pick_bucket(c, avg_samples_per_ray=1e9) == 1


def test_schedule_derivations():
    c = cfg(batch_size=2048)
    assert c.total_steps == 4096  # 2048 * (4096/2048)
    assert c.occ_update_every == 32
    assert abs(c.occ_decay - 0.01 ** (1 / 16)) < 1e-12
    assert c.sample_cap == 2048 * 400

    c2 = cfg(batch_size=4096)
    assert c2.total_steps == 2048
    assert c2.occ_update_every == 16
