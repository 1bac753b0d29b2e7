"""Train state containers (params + BN stats + optimizer state)."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Like ``flax.training.train_state.TrainState`` plus a ``batch_stats``
    collection for BatchNorm models (empty dict for stateless nets)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else {},
            opt_state=tx.init(params),
            apply_fn=apply_fn,
            tx=tx,
        )

    def apply_gradients(self, grads, batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


class FrozenModel(struct.PyTreeNode):
    """A frozen (eval-only) network: the clean model and the frequency
    detector in the alternated loop (reference train_generator.py:509-527)."""

    params: Any
    batch_stats: Any
    apply_fn: Callable = struct.field(pytree_node=False)

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def __call__(self, x, **kwargs):
        return self.apply_fn(self.variables, x, train=False, **kwargs)


def init_train_state(model, key, sample_input, tx, extra_args=()) -> TrainState:
    variables = model.init({"params": key, "dropout": key}, sample_input, *extra_args)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def init_frozen(model, key, sample_input) -> FrozenModel:
    variables = model.init({"params": key, "dropout": key}, sample_input)
    return FrozenModel(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        apply_fn=model.apply,
    )
