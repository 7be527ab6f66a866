"""Data-parallel multi-chip training over a jax.sharding.Mesh.

3DGS training is embarrassingly data-parallel over views: each chip
renders (and differentiates) a different camera against its own target
image; the gradients are one ``psum`` over ICI away from a replicated
optimizer update.  The splat model is small (tens of MB) next to the
per-view activation memory, so full replication of params + optimizer
state is the right sharding — the per-view pair structure, the k_max
gather and the blend activations (the actual memory) stay
device-local, and the only collective in the step is the gradient
all-reduce.  (The CUDA reference is forward-only and single-GPU,
SURVEY.md §2; this layer has no reference analog.)

Built on shard_map: the jitted step takes view-batched cameras/targets
(leading axis = mesh axis), runs the single-device loss — the same
render_diff / loss math fit() uses — per shard, and psums.  Throughput
scales with devices at a fixed per-step wall clock (one view's
forward+backward + an ~MB-scale all-reduce).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..diff import DiffSplats, render_diff, ssim


def view_batch(cameras_data, targets):
    """Stack per-view camera pytrees and targets on a leading axis
    (the mesh's data-parallel axis)."""
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *cameras_data
    )
    tgts = jnp.stack(
        [
            jnp.asarray(np.asarray(t)[..., :3], jnp.float32)
            / (255.0 if np.asarray(t).dtype == np.uint8 else 1.0)
            for t in targets
        ]
    )
    return cams, tgts


def make_train_step_dp(
    config: RenderConfig,
    capacity: int,
    k_max: int,
    tx,
    mesh: Mesh,
    *,
    axis: str = "dp",
    l1_weight: float = 0.8,
    ssim_weight: float = 0.2,
    l2_weight: float = 0.0,
    remat: Optional[bool] = None,
    interpret: Optional[bool] = None,
):
    """Build the jitted data-parallel training step.

    Returns step(params, opt_state, cams_batch, targets_batch) ->
    (params, opt_state, loss) where the batch leading axis is sharded
    over ``axis`` (one or more views per device), params/opt_state are
    replicated, and the returned loss is the view-mean.  The gradient
    all-reduce is the step's only collective.
    """
    import optax  # noqa: F401  (tx is an optax transform)

    n_dev = mesh.shape[axis]

    def local_loss(p, cam_b, target_b):
        # cam_b/target_b: this device's [B_local, ...] slice; mean over
        # the local views (B_local is usually 1).
        def one(cam, target):
            image, _ = render_diff(
                p, cam, config, capacity, k_max, remat=remat,
                interpret=interpret,
            )
            err = image[..., :3] - target
            loss = l2_weight * jnp.mean(err * err) if l2_weight else 0.0
            if l1_weight:
                loss = loss + l1_weight * jnp.mean(jnp.abs(err))
            if ssim_weight:
                loss = loss + ssim_weight * (
                    1.0 - ssim(image[..., :3], target)
                )
            return loss

        losses = jax.lax.map(lambda ct: one(*ct), (cam_b, target_b))
        return jnp.mean(losses)

    def shard_step(p, opt_state, cam_b, target_b):
        loss, grads = jax.value_and_grad(local_loss)(p, cam_b, target_b)
        # The one collective: mean gradients (and loss) over devices.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, p)
        import optax

        return optax.apply_updates(p, updates), opt_state, loss

    def step(params, opt_state, cams_batch, targets_batch):
        rep = P()
        return jax.shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(rep, rep, P(axis), P(axis)),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )(params, opt_state, cams_batch, targets_batch)

    return jax.jit(step), n_dev


def fit_dp(
    params: DiffSplats,
    cameras_data,
    targets,
    config: RenderConfig,
    *,
    capacity: int,
    k_max: int,
    mesh: Mesh,
    axis: str = "dp",
    steps: int = 100,
    learning_rate: float = 5e-3,
    tx=None,
    l1_weight: float = 0.8,
    ssim_weight: float = 0.2,
    l2_weight: float = 0.0,
    remat: Optional[bool] = None,
    interpret: Optional[bool] = None,
    log_every: int = 0,
):
    """Data-parallel fit: every step trains on n_devices views at once
    (round-robin over the dataset in device-sized groups).  The
    single-device diff.fit remains the feature-complete path (density
    control, pose/exposure extras, checkpoints); this one is the
    throughput path for big view sets on real meshes.

    Returns (params, losses [steps] — view-mean per step).
    """
    import optax

    if tx is None:
        tx = optax.adam(learning_rate)
    n_dev = mesh.shape[axis]
    n_views = len(cameras_data)
    if n_views % n_dev != 0:
        # Cycle the view list up to the next multiple of n_dev so
        # device groups divide evenly (every view still trains).
        need = -(-n_views // n_dev) * n_dev
        order = [i % n_views for i in range(need)]
        cameras_data = [cameras_data[i] for i in order]
        targets = [targets[i] for i in order]
        n_views = need
    step, _ = make_train_step_dp(
        config, capacity, k_max, tx, mesh, axis=axis,
        l1_weight=l1_weight, ssim_weight=ssim_weight,
        l2_weight=l2_weight, remat=remat, interpret=interpret,
    )
    opt_state = tx.init(params)
    losses = np.zeros(steps, np.float32)
    n_groups = n_views // n_dev
    for i in range(steps):
        g = (i % n_groups) * n_dev
        cams_b, tgts_b = view_batch(
            cameras_data[g:g + n_dev], targets[g:g + n_dev]
        )
        params, opt_state, loss = step(params, opt_state, cams_b, tgts_b)
        losses[i] = float(loss)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"dp step {i:5d}  loss {float(loss):.6f}", flush=True)
    return params, losses
