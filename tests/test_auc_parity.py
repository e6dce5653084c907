"""Reference-anchored AUC head-to-head (VERDICT r3 #4, BASELINE.md quality
bar): the reference demo model equation in plain TensorFlow vs the
tpu-native MovieRankingTask, trained on IDENTICAL frozen batches. See
monolith_tpu/parity.py for the twin-model details (ref
markdown/demo/demo_model.py:40-77)."""

import numpy as np
import pytest

from monolith_tpu import parity


@pytest.mark.slow
def test_reference_auc_head_to_head():
    r = parity.auc_parity()
    # both sides must actually have learned (far above chance)
    assert r["monolith_auc"] > 0.85, r
    assert r["reference_auc"] > 0.85, r
    # and agree within run-to-run variance
    assert abs(r["delta"]) <= parity.PARITY_BAND, r


def test_movie_ranking_task_smoke(tmp_path):
    """The zoo task + MovieLens ingestion train (fast tier): loss finite
    and decreasing on a short run; rating head returns raw logits."""
    import itertools

    from monolith_tpu.data.movielens import MovieLensRatings, generate_sample
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.movie_ranking import MovieRankingTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    path = generate_sample(str(tmp_path / "ratings.dat"), num_users=200,
                           num_items=150, num_ratings=30_000, seed=9)
    data = MovieLensRatings(path=path, batch_size=256, seed=5)
    tr = Trainer(MovieRankingTask(capacity_per_shard=4096, hidden=(32, 16)),
                 TrainerConfig(engine=EngineConfig(unique_cap=1024,
                                                   new_cap=1024),
                               log_every=0))
    it = iter(data)
    losses = []
    for _ in range(40):
        fb, b = next(it)
        losses.append(float(tr.train_step(fb, b)["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    rt = Trainer(MovieRankingTask(capacity_per_shard=4096, hidden=(32, 16),
                                  head="rating"),
                 TrainerConfig(engine=EngineConfig(unique_cap=1024,
                                                   new_cap=1024),
                               log_every=0))
    fb, b = next(it)
    out = rt.train_step(fb, b)
    assert np.isfinite(float(out["loss"]))
