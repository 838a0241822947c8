"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference has no checkpointing (SURVEY.md §5): its closest artifacts are
the on-demand PPM screenshot (src/MiroWindow.cpp:471-488) and the progressive
bucket blit (src/Scene.cpp:135), neither of which can resume. Here a render
is a sum of independent spp batches, so the accumulated radiance buffer plus
the batch cursor IS the resumable state; likewise an optimization run is
(params, opt_state, step). Both are saved as atomic .npz files (write to a
temp file, `os.replace` — a crash mid-save never corrupts the previous
checkpoint).
"""
from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Scene, Camera, RenderSettings
from . import console

_MAGIC = 'raytracer_tpu-ckpt-v1'


def _flatten_tree(tree) -> dict:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat['__treedef__'] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        flat[f'leaf_{i}'] = np.asarray(leaf)
    return flat


def _unflatten_like(tree, flat: dict):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    new_leaves = [flat[f'leaf_{i}'] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_state(path: str, tree, **scalars) -> None:
    """Atomically save a pytree + named scalars to `path` (.npz)."""
    payload = _flatten_tree(tree)
    for k, v in scalars.items():
        payload[f'scalar_{k}'] = np.asarray(v)
    payload['magic'] = np.frombuffer(_MAGIC.encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix='.tmp')
    try:
        with os.fdopen(fd, 'wb') as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str, like_tree):
    """Load (tree, scalars) saved by save_state; tree matches `like_tree`'s
    structure. Returns None if the file does not exist."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    magic = bytes(flat.get('magic', b'')).decode(errors='replace')
    if magic != _MAGIC:
        raise ValueError(f'{path}: not a raytracer_tpu checkpoint')
    tree = _unflatten_like(like_tree, flat)
    scalars = {k[len('scalar_'):]: flat[k] for k in flat
               if k.startswith('scalar_')}
    return tree, scalars


def render_progressive(scene: Scene, cam: Camera, settings: RenderSettings,
                       key: jax.Array, spp_total: int, spp_batch: int = 1,
                       ckpt_path: str | None = None, save_every: int = 1,
                       log: bool = False, on_batch=None):
    """Render spp_total samples in batches, checkpointing between batches.

    Resumable: if `ckpt_path` exists, accumulation continues from the saved
    batch cursor (identical final image to an uninterrupted run — each batch
    folds its index into the key, so batch streams are independent of
    start/stop boundaries).

    on_batch(mean_img_u8ready (H,W,3) f32, batches_done, n_batches) is
    called after every batch — the progressive front end (cli --progressive)
    writes the current image + a stats line from it (the reference's
    progressive GL blit, src/MiroWindow.cpp:471-488).

    Returns the averaged (H, W, 3) image.
    """
    from ..render import renderer

    n_batches = -(-spp_total // spp_batch)
    acc = jnp.zeros((settings.height, settings.width, 3), jnp.float32)
    done = 0

    if ckpt_path:
        loaded = load_state(ckpt_path, acc)
        if loaded is not None:
            acc, scalars = loaded
            acc = jnp.asarray(acc)
            done = int(scalars['batches_done'])
            if int(scalars.get('spp_batch', spp_batch)) != spp_batch:
                raise ValueError('resume with a different spp_batch')
            if log:
                console.info('resuming at batch %d/%d from %s',
                             done, n_batches, ckpt_path)

    for bi in range(done, n_batches):
        k = jax.random.fold_in(key, bi)
        img = renderer.render(scene, cam, settings, k, spp=spp_batch)
        acc = acc + img * spp_batch
        if ckpt_path and ((bi + 1) % save_every == 0 or bi + 1 == n_batches):
            jax.block_until_ready(acc)
            save_state(ckpt_path, np.asarray(acc), batches_done=bi + 1,
                       spp_batch=spp_batch)
        if on_batch is not None:
            on_batch(np.asarray(acc) / ((bi + 1) * spp_batch), bi + 1,
                     n_batches)
        if log:
            console.debug('batch %d/%d done', bi + 1, n_batches)

    return acc / (n_batches * spp_batch)


def save_train_state(path: str, params, opt_state, step: int,
                     loss: float = float('nan')) -> None:
    """Checkpoint an inverse-rendering optimization (params + optimizer)."""
    save_state(path, (params, opt_state), step=step, loss=loss)


def load_train_state(path: str, params, opt_state):
    """Restore (params, opt_state, step) or None if no checkpoint exists."""
    loaded = load_state(path, (params, opt_state))
    if loaded is None:
        return None
    (params, opt_state), scalars = loaded
    return params, opt_state, int(scalars['step'])
