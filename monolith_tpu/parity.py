"""Reference-anchored AUC head-to-head (BASELINE.md quality bar).

The reference's quality surface is its MovieLens demo model (ref
markdown/demo/demo_model.py): per-feature embedding tables, 32-dim
slices, concat -> Dense(256) -> Dense(64) -> Dense(1). Its custom C++
ops are not built in this image, but the demo equation is plain TF
math — so this module trains BOTH

  * the tpu-native MovieRankingTask (models/movie_ranking.py), and
  * a line-faithful plain-TensorFlow twin of the reference demo model
    (same equation, same optimizers: embeddings Adagrad w/ accumulator
    1.0 per ref feature.py:86-88, dense tower Adagrad(0.05) per ref
    demo_model.py:64, same init distributions)

on the SAME frozen dataset — materialized batches from the vendored
MovieLens-format sample (examples/movielens/, the reference demo's own
data domain; both sides consume identical numpy arrays) — and compares
eval AUC. |delta| must sit inside the run-to-run variance band
(tests/test_auc_parity.py asserts it; bench.py MT_BENCH_CONFIG=
auc_parity records both numbers in BENCH_DETAILS.json).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

#: Frozen head-to-head config: ~6 epochs over the 80k-rating vendored
#: MovieLens sample reaches the knee of the AUC curve for both sides
#: (the demo CLI hits ~0.89 eval AUC here) while the eagerly-executing
#: TF twin stays affordable on one CPU core. lr = the reference demo's
#: own Adagrad 0.05 (demo_model.py:64).
PARITY = dict(steps=800, batch_size=512, eval_steps=15,
              embedding_dim=32, hidden=(256, 64), lr=0.05, seed=0,
              data_seed=7)

#: Allowed |monolith_auc - reference_auc|. Measured run-to-run spread of
#: either side across seeds is ~0.004 at this config; 0.015 covers it
#: with margin while still failing on any real training defect (a broken
#: optimizer/admission/pooling lands 0.05+ away).
PARITY_BAND = 0.015


def _sample_path() -> str:
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "movielens", "ratings.dat")


def frozen_data(cfg=None):
    """Materialize the train + eval batches both frameworks consume
    (temporal split of the vendored MovieLens-format sample)."""
    import itertools
    import os

    from monolith_tpu.data.movielens import MovieLensRatings, generate_sample

    cfg = cfg or PARITY
    path = _sample_path()
    if not os.path.exists(path):  # e.g. a stripped checkout: regenerate
        generate_sample(path)
    tr = MovieLensRatings(path=path, batch_size=cfg["batch_size"],
                          split="train", seed=cfg["data_seed"])
    ev = MovieLensRatings(path=path, batch_size=cfg["batch_size"],
                          split="eval")
    train = list(itertools.islice(iter(tr), cfg["steps"]))
    evals = list(itertools.islice(iter(ev), cfg["eval_steps"]))
    return train, evals


def train_monolith(train: List, evals: List, cfg=None) -> float:
    """Train MovieRankingTask on the frozen batches; return eval AUC."""
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.movie_ranking import MovieRankingTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    cfg = cfg or PARITY
    task = MovieRankingTask(embedding_dim=cfg["embedding_dim"],
                            hidden=cfg["hidden"], embedding_lr=cfg["lr"],
                            dense_lr=cfg["lr"])
    trainer = Trainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=4096, new_cap=4096),
        log_every=0, seed=cfg["seed"]))
    for fb, b in train:
        trainer.train_step(fb, b)
    return trainer.evaluate(iter(evals))["auc"]


def train_reference_tf(train: List, evals: List, cfg=None) -> float:
    """The reference demo model equation in plain TensorFlow.

    Faithful to ref markdown/demo/demo_model.py:45-64 adapted to the
    binary-label stream (sigmoid head, the reference EstimatorSpec
    classification path): one embedding variable per sparse feature (the
    collisionless-table role — ids here are dense so a dense variable IS
    collisionless), 32-dim slices, concat -> 256 -> 64 -> 1.

    Twin-fidelity note (VERDICT r4 weak #6): the dense tower uses Keras
    Adagrad where the reference uses TF1
    tf.compat.v1.train.AdagradOptimizer (demo_model.py:64). The update
    math is identical; initial-accumulator and epsilon conventions differ
    subtly across TF generations (TF1 bakes epsilon into the accumulator
    init, Keras adds epsilon in the denominator). The effect is well
    inside the assertion band: observed per-round AUC spread of the twin
    itself is ~0.004 (r4: 0.8890 +/- 0.001, delta to monolith -0.003,
    band +/-0.015). Pin each round's observed spread in BASELINE.md so
    drift stays visible."""
    import tensorflow as tf

    from monolith_tpu.data import movielens
    from monolith_tpu.metrics import StreamingAUC

    cfg = cfg or PARITY
    tf.random.set_seed(cfg["seed"])
    dim, (h1, h2) = cfg["embedding_dim"], cfg["hidden"]
    rng = np.random.default_rng(cfg["seed"])
    scale = 0.05  # same RandomUniform range as MovieRankingTask
    u_slot = np.int64(movielens.USER_SLOT)
    i_slot = np.int64(movielens.ITEM_SLOT)
    num_users = 1 + int(max(int(fb["user_id"].max() - u_slot)
                            for fb, _ in train))
    num_items = 1 + int(max(int(fb["item_id"].max() - i_slot)
                            for fb, _ in train))
    e_user = tf.Variable(rng.uniform(
        -scale, scale, (num_users, dim)).astype(np.float32))
    e_item = tf.Variable(rng.uniform(
        -scale, scale, (num_items, dim)).astype(np.float32))
    tower = tf.keras.Sequential([
        tf.keras.layers.Dense(h1, activation="relu"),
        tf.keras.layers.Dense(h2, activation="relu"),
        tf.keras.layers.Dense(1),
    ])
    tower.build((None, 2 * dim))
    # embeddings: ref feature.py:87 default AdagradOptimizer(accum=1.0);
    # dense tower: ref demo_model.py:64 tf.train.AdagradOptimizer(0.05)
    # (TF1 default initial_accumulator_value=0.1)
    emb_opt = tf.keras.optimizers.Adagrad(cfg["lr"],
                                          initial_accumulator_value=1.0)
    dense_opt = tf.keras.optimizers.Adagrad(cfg["lr"],
                                            initial_accumulator_value=0.1)
    def fwd(u, v):
        x = tf.concat([tf.gather(e_user, u), tf.gather(e_item, v)], axis=1)
        return tower(x)[:, 0]

    @tf.function
    def step(u, v, label):
        with tf.GradientTape() as tape:
            logits = fwd(u, v)
            loss = tf.reduce_mean(
                tf.nn.sigmoid_cross_entropy_with_logits(labels=label,
                                                        logits=logits))
        evars = [e_user, e_item]
        grads = tape.gradient(loss, evars + tower.trainable_variables)
        emb_opt.apply_gradients(zip(grads[:2], evars))
        dense_opt.apply_gradients(zip(grads[2:],
                                      tower.trainable_variables))
        return loss

    def ids(fb):
        u = np.minimum((fb["user_id"][:, 0] - u_slot), num_users - 1)
        v = np.minimum((fb["item_id"][:, 0] - i_slot), num_items - 1)
        return u.astype(np.int64), v.astype(np.int64)

    for fb, b in train:
        u, v = ids(fb)
        step(tf.constant(u), tf.constant(v), tf.constant(b["label"]))
    auc = StreamingAUC()
    for fb, b in evals:
        u, v = ids(fb)
        preds = tf.sigmoid(fwd(tf.constant(u), tf.constant(v))).numpy()
        auc.update(preds, b["label"])
    return auc.result()


def auc_parity(cfg=None) -> Dict[str, float]:
    """Run the head-to-head; returns both AUCs, the delta, and the Bayes
    ceiling of the frozen generator."""
    cfg = cfg or PARITY
    train, evals = frozen_data(cfg)
    ref = train_reference_tf(train, evals, cfg)
    mono = train_monolith(train, evals, cfg)
    return {"monolith_auc": mono, "reference_auc": ref,
            "delta": mono - ref, "band": PARITY_BAND}
