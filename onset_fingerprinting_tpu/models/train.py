"""Training loops: optax optimizers, schedules, early stopping, DP sharding.

Replaces the reference's Lightning/optuna training stack (reference:
train.py:46-145; model.py configure_optimizers blocks at 146-162, 289-307,
606-629) with a jitted functional trainer:

- NAdam / SGD-momentum / Adam optimizers with cosine annealing and
  cosine-warm-restarts schedules (the reference's
  ``CosineAnnealingWarmRestarts(250, 1)`` etc.).
- Full-batch or mini-batch training, early stopping with patience and
  ``min_epochs`` (EarlyStopping(patience=500), train.py:101).
- Optional data-parallel sharding over a ``jax.sharding.Mesh``: batches are
  sharded over the ``data`` axis, gradients psum'd by XLA — the TPU-native
  replacement for the reference's (absent) multi-device story.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onset_fingerprinting_tpu.core.config import TrainConfig


def cosine_warm_restarts(lr: float, period: int, t_mult: int = 1):
    """CosineAnnealingWarmRestarts-compatible schedule (t_mult=1 keeps a
    fixed period, like the reference's (250, 1))."""

    def schedule(step):
        t = step % period if t_mult == 1 else step
        return lr * 0.5 * (1 + jnp.cos(jnp.pi * (t % period) / period))

    return schedule


def make_optimizer(
    name: str = "nadam",
    lr: float = 1e-3,
    schedule: str = "cosine_restarts",
    schedule_period: int = 250,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    momentum: float = 0.8,
) -> optax.GradientTransformation:
    if schedule == "cosine_restarts":
        sched = cosine_warm_restarts(lr, schedule_period)
    elif schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, schedule_period)
    else:
        sched = lr
    if name == "nadam":
        tx = optax.nadam(sched)
    elif name == "adam":
        tx = optax.adam(sched)
    elif name == "sgd":
        tx = optax.sgd(sched, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name}")
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(tx)
    return optax.chain(*chain)


def _xent(logits, labels):
    """Softmax cross-entropy with integer labels (zone classification)."""
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(
        jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)
    )


LOSSES: dict[str, Callable] = {
    "l1": lambda out, y: jnp.mean(jnp.abs(out - y)),
    "mse": lambda out, y: jnp.mean((out - y) ** 2),
    "xent": _xent,
}


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray


@dataclass
class Trainer:
    """Jitted trainer with early stopping and optional DP mesh sharding."""

    model: Any
    cfg: TrainConfig = field(default_factory=TrainConfig)
    optimizer: Optional[optax.GradientTransformation] = None
    mesh: Optional[Mesh] = None
    log_every: int = 0

    def __post_init__(self):
        if self.optimizer is None:
            self.optimizer = make_optimizer(
                self.cfg.optimizer,
                self.cfg.lr,
                grad_clip=self.cfg.grad_clip,
                weight_decay=self.cfg.weight_decay,
            )
        self.loss_fn = LOSSES[self.cfg.loss]
        self.history: dict[str, list[float]] = {
            "train_loss": [],
            "val_loss": [],
        }

    # -- core steps ---------------------------------------------------------

    def init_state(self, x: jnp.ndarray) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        rng, init_rng, drop = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": init_rng, "dropout": drop}, x[:1], train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            rng=rng,
            step=jnp.zeros((), jnp.int32),
        )

    def _apply(self, params, batch_stats, x, train, rng=None):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"] if train else []
        kwargs = {"train": train}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train and mutable:
            out, updates = self.model.apply(
                variables, x, mutable=mutable, **kwargs
            )
            return out, updates.get("batch_stats", batch_stats)
        return self.model.apply(variables, x, **kwargs), batch_stats

    def _train_step_body(self, state: TrainState, x, y):
        rng, drop = jax.random.split(state.rng)

        def loss_of(params):
            out, bs = self._apply(
                params, state.batch_stats, x, True, drop
            )
            return self.loss_fn(out, y), bs

        (loss, bs), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, bs, opt_state, rng, state.step + 1),
            loss,
        )

    def make_train_step(self):
        if getattr(self, "_jit_train_step", None) is None:
            if self.mesh is not None:
                dsh = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                self._jit_train_step = jax.jit(
                    self._train_step_body,
                    in_shardings=(rep, dsh, dsh),
                    out_shardings=(rep, rep),
                )
            else:
                self._jit_train_step = jax.jit(self._train_step_body)
        return self._jit_train_step

    def make_train_many(self, k: int):
        """K full-batch epochs in ONE device dispatch (lax.scan) — on a
        remote/tunneled TPU the per-epoch host sync (~tens of ms RTT)
        otherwise dominates small-model training."""
        cache = getattr(self, "_jit_train_many", None)
        if cache is None:
            cache = self._jit_train_many = {}
        if k not in cache:
            def train_many(state, x, y):
                def body(s, _):
                    s, loss = self._train_step_body(s, x, y)
                    return s, loss

                return jax.lax.scan(body, state, None, length=k)

            if self.mesh is not None:
                dsh = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                cache[k] = jax.jit(
                    train_many,
                    in_shardings=(rep, dsh, dsh),
                    out_shardings=(rep, rep),
                )
            else:
                cache[k] = jax.jit(train_many)
        return cache[k]

    def make_eval_step(self):
        if getattr(self, "_jit_eval_step", None) is None:
            def eval_step(state: TrainState, x, y):
                out, _ = self._apply(
                    state.params, state.batch_stats, x, False
                )
                return self.loss_fn(out, y)

            self._jit_eval_step = jax.jit(eval_step)
        return self._jit_eval_step

    # -- loops ---------------------------------------------------------------

    def fit(
        self,
        train_data: tuple[np.ndarray, np.ndarray],
        val_data: Optional[tuple[np.ndarray, np.ndarray]] = None,
        num_epochs: Optional[int] = None,
        state: Optional[TrainState] = None,
        epochs_per_step: int = 1,
    ) -> TrainState:
        """Full-batch (batch_size None, like train.py:41) or mini-batch fit
        with early stopping on val loss (train loss if no val set).

        ``state`` continues training from a prior fit's returned state
        (fresh init otherwise).  ``epochs_per_step`` > 1 scans that many
        full-batch epochs per device dispatch — early stopping and the
        monitor are then evaluated at that granularity.
        """
        x, y = (jnp.asarray(train_data[0]), jnp.asarray(train_data[1]))
        num_epochs = num_epochs or self.cfg.num_epochs
        if state is None:
            state = self.init_state(x)
        eval_step = self.make_eval_step()
        bsz = self.cfg.batch_size
        if bsz is None and epochs_per_step > 1:
            return self._fit_scanned(
                state, x, y, val_data, num_epochs, epochs_per_step, eval_step
            )
        train_step = self.make_train_step()
        best_state = state
        best_loss = math.inf
        patience = 0
        perm_rng = np.random.default_rng(self.cfg.seed)
        for epoch in range(num_epochs):
            if bsz is None:
                state, loss = train_step(state, x, y)
                losses = [float(loss)]
            else:
                idx = perm_rng.permutation(len(x))
                losses = []
                for i in range(0, len(x) - bsz + 1, bsz):
                    b = idx[i : i + bsz]
                    state, loss = train_step(state, x[b], y[b])
                    losses.append(float(loss))
            train_loss = float(np.mean(losses))
            self.history["train_loss"].append(train_loss)
            if val_data is not None:
                monitor = float(
                    eval_step(
                        state, jnp.asarray(val_data[0]), jnp.asarray(val_data[1])
                    )
                )
                self.history["val_loss"].append(monitor)
            else:
                monitor = train_loss
            if self.log_every and epoch % self.log_every == 0:
                print(f"epoch {epoch}: train {train_loss:.5f} monitor {monitor:.5f}")
            if monitor < best_loss - self.cfg.eps:
                best_loss = monitor
                best_state = state
                patience = 0
            elif epoch >= self.cfg.min_epochs:
                patience += 1
                if patience > self.cfg.patience:
                    break
        self.best_loss = best_loss
        return best_state

    def _fit_scanned(
        self, state, x, y, val_data, num_epochs, k, eval_step
    ) -> TrainState:
        train_many = self.make_train_many(k)
        if val_data is not None:
            vx = jnp.asarray(val_data[0])
            vy = jnp.asarray(val_data[1])
        best_state = state
        best_loss = math.inf
        patience = 0
        # run-local epoch counter: history accumulates across fit() calls,
        # so deriving the epoch from len(history) would let a continued
        # fit(state=...) start past min_epochs and early-stop immediately
        epoch = 0
        for _ in range(-(-num_epochs // k)):
            state, losses = train_many(state, x, y)
            losses = np.asarray(losses, dtype=np.float64)
            self.history["train_loss"].extend(float(v) for v in losses)
            if val_data is not None:
                monitor = float(eval_step(state, vx, vy))
                self.history["val_loss"].append(monitor)
            else:
                monitor = float(losses[-1])
            epoch += len(losses)
            if monitor < best_loss - self.cfg.eps:
                best_loss = monitor
                best_state = state
                patience = 0
            elif epoch >= self.cfg.min_epochs:
                patience += k
                if patience > self.cfg.patience:
                    break
        self.best_loss = best_loss
        return best_state

    def test(
        self, state: TrainState, test_data: tuple[np.ndarray, np.ndarray]
    ) -> float:
        """L1 test metric — the reference's ``hp_metric`` (model.py:136-144)."""
        x, y = jnp.asarray(test_data[0]), jnp.asarray(test_data[1])
        out, _ = self._apply(state.params, state.batch_stats, x, False)
        return float(jnp.mean(jnp.abs(out - y)))

    def accuracy(
        self, state: TrainState, data: tuple[np.ndarray, np.ndarray]
    ) -> float:
        """Classification accuracy (for zone classifiers on POSD)."""
        x, y = jnp.asarray(data[0]), np.asarray(data[1])
        out, _ = self._apply(state.params, state.batch_stats, x, False)
        return float((np.asarray(out).argmax(axis=1) == y).mean())

    def predict(self, state: TrainState, x: np.ndarray) -> np.ndarray:
        out, _ = self._apply(
            state.params, state.batch_stats, jnp.asarray(x), False
        )
        return np.asarray(out)

    # -- checkpoint / resume (orbax; SURVEY §5.4) -----------------------------

    def save_checkpoint(self, state: TrainState, path) -> None:
        """Persist params + batch stats (model weights) with orbax."""
        import pathlib

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        }
        ckptr.save(pathlib.Path(path).resolve(), payload, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path, example_x: np.ndarray) -> TrainState:
        """Restore into a fresh TrainState (optimizer state reinitialized)."""
        import pathlib

        import orbax.checkpoint as ocp

        state = self.init_state(jnp.asarray(example_x))
        target = {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        }
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(pathlib.Path(path).resolve(), target=target)
        return state._replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=self.optimizer.init(restored["params"]),
        )
