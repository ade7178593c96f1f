"""Jitted training/eval steps and the epoch loop.

The reference trains through Keras fit_generator on one device
(/root/reference/myolo/model.py:1047-1059). Here a single
`train_step = jit(grad(training_loss))` is compiled once per config and runs
with the batch sharded over the mesh's 'data' axis — XLA inserts the gradient
all-reduce over ICI automatically (SURVEY.md §2.3 "TPU-native plan"). The
warm-up counter the reference kept as a mutable tf.Variable inside the loss
(model.py:99) is `state.step`, threaded explicitly.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from .. import pipelines
from .state import TrainState


def make_train_step(net, config, tx, mode: str = "training"):
    """Build the jitted train step: (state, batch) -> (state, metrics)."""
    loss_fn = pipelines.training_loss if mode == "training" else pipelines.yolo_only_loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            return loss_fn(net, variables, batch, config,
                           seen=state.step.astype(jnp.float32),
                           train=True, mutable_stats=True)

        (loss, (metrics, updates)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_params_updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, new_params_updates)
        new_stats = updates.get("batch_stats", state.batch_stats) if updates else state.batch_stats
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt_state, step=state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(net, config, mode: str = "training"):
    loss_fn = pipelines.training_loss if mode == "training" else pipelines.yolo_only_loss

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, (metrics, _) = loss_fn(net, variables, batch, config,
                                  seen=1e9, train=False, mutable_stats=False)
        return metrics

    return eval_step


class _LimitedSource:
    """Length-capped view of a batch source (STEPS_PER_EPOCH semantics)."""

    def __init__(self, source, max_steps: int):
        self.source = source
        self.max_steps = max_steps

    def __len__(self):
        return min(len(self.source), self.max_steps)

    def __getitem__(self, i):
        return self.source[i]


def run_epoch(train_step, state, generator, mesh=None, log_every: int = 10,
              verbose: bool = True, profile_dir=None, profile_steps=(2, 5),
              prefetch: int = 2, max_steps: int = 0):
    """One pass over the generator. Returns (state, last_metrics).

    profile_dir: if set, capture a jax.profiler trace (viewable in
    TensorBoard/XProf) covering steps [profile_steps[0], profile_steps[1]) —
    the observability hook the reference only approximates with a TensorBoard
    graph callback (model.py:1024-1027; SURVEY.md §5 tracing row).
    prefetch: stage this many batches ahead on device from a background
    thread (0 disables) so host batch prep + transfer overlap compute.
    max_steps: positive = cap the epoch at this many steps (the
    STEPS_PER_EPOCH knob, reference config.py:62); 0 = full generator.
    """
    from ..data.prefetch import DevicePrefetcher
    from ..parallel.mesh import batch_sharding, shard_batch

    if max_steps and max_steps > 0:
        generator = _LimitedSource(generator, int(max_steps))
    metrics = {}
    t0 = time.perf_counter()
    tracing = False
    if prefetch:
        sharding = batch_sharding(mesh) if mesh is not None else None
        batches = iter(DevicePrefetcher(generator, sharding, size=prefetch))
    else:
        batches = (shard_batch(generator[i], mesh) if mesh is not None
                   else generator[i] for i in range(len(generator)))
    for i, batch in enumerate(batches):
        if profile_dir is not None:
            if i == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            elif i == profile_steps[1] and tracing:
                jax.tree.map(
                    lambda x: x.block_until_ready(),
                    metrics)
                jax.profiler.stop_trace()
                tracing = False
        state, metrics = train_step(state, batch)
        if verbose and (i + 1) % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t0
            print(f"  step {i+1}/{len(generator)}  "
                  f"loss={m.get('loss', 0):.4f}  "
                  f"recall={m.get('recall', 0):.3f}  "
                  f"({dt / (i+1):.3f}s/step)")
    if tracing:
        jax.profiler.stop_trace()
    return state, {k: float(v) for k, v in metrics.items()}
