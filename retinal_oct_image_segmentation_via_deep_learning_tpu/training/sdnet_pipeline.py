"""SDNet composite training step — semi-supervised disentanglement.

The reference ships the SDNet system without a training script (SURVEY.md
§2.5); this trainer implements the canonical SDNet/ACNN-style objective over
the composite outputs:

    L = CE(clean_masks, labels)                      (supervised masks)
      + w_rec * |reconstruction - image|             (reconstruction)
      + w_kl * KL(z_mean, z_logvar)                  (VAE prior)
      + w_z * |z_estimate - sampled_z|               (modality cycle)
      + w_topo * mean(topology_violations)
      + w_cont * mean(continuity_violations)
      + w_curv * mean(relu(curvature_diffs))

using the violation tensors the LayerEngine emits (reference
``layer_engine.py:74-94``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ..models.sdnet.sdnet import SDNet
from .losses import kl_divergence


@dataclasses.dataclass
class SDNetTrainer:
    img_size: int = 256
    n_classes: int = 4
    n_anatomical_factors: int = 12
    channels: tuple = (32, 64, 128, 256, 512)
    learning_rate: float = 1e-4
    w_rec: float = 1.0
    w_kl: float = 0.01
    w_z: float = 1.0
    w_topo: float = 0.1
    w_cont: float = 0.01
    w_curv: float = 0.01
    seed: int = 0

    def __post_init__(self):
        self.model = SDNet(
            img_size=self.img_size,
            n_classes=self.n_classes,
            n_anatomical_factors=self.n_anatomical_factors,
            channels=tuple(self.channels),
        )
        self.tx = optax.adam(self.learning_rate)

    def init(self, sample_img):
        variables = self.model.init(
            {"params": jax.random.PRNGKey(self.seed),
             "latent": jax.random.PRNGKey(self.seed + 1)},
            sample_img,
        )
        return variables, self.tx.init(variables["params"])

    def loss_fn(self, params, batch_stats, images, labels, rng, train=True):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = self.model.apply(
            variables,
            images,
            train=train,
            rngs={"latent": rng},
            mutable=["batch_stats"] if train else [],
        ) if train else (
            self.model.apply(variables, images, train=False,
                             rngs={"latent": rng}),
            {},
        )

        masks = jnp.clip(out["clean_masks"], 1e-7, 1.0)
        onehot = jax.nn.one_hot(labels, masks.shape[-1])
        ce = -jnp.mean(jnp.sum(onehot * jnp.log(masks), axis=-1))

        rec = jnp.mean(jnp.abs(out["reconstruction"] - images))
        kl = kl_divergence(out["z_mean"], out["z_logvar"])
        zcycle = jnp.mean(jnp.abs(out["z_estimate"] - out["sampled_z"]))
        el = out["extra_losses"]
        topo = jnp.mean(el["topology_violations"])
        cont = jnp.mean(el["continuity_violations"])
        curv = jnp.mean(jnp.maximum(el["curvature_diffs"], 0.0))

        total = (
            ce
            + self.w_rec * rec
            + self.w_kl * kl
            + self.w_z * zcycle
            + self.w_topo * topo
            + self.w_cont * cont
            + self.w_curv * curv
        )
        metrics = {
            "ce": ce, "rec": rec, "kl": kl, "z_cycle": zcycle,
            "topology": topo, "continuity": cont, "curvature": curv,
        }
        return total, (metrics, mutated)

    def make_train_step(self):
        @jax.jit
        def step(variables, opt_state, images, labels, rng):
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            (loss, (metrics, mutated)), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(params, stats, images, labels, rng)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_vars = {"params": params}
            if mutated:
                new_vars["batch_stats"] = mutated["batch_stats"]
            elif stats:
                new_vars["batch_stats"] = stats
            return new_vars, opt_state, loss, metrics

        return step
