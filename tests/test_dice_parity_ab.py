"""Synthetic Dice-parity A/B: reference torch U-Net vs the Flax U-Net.

The accuracy half of the north star (BASELINE.md) without Duke data in the
environment: both frameworks train the SAME architecture
(`/root/reference/SOTAS/Lesions_Segment/YNet_2022.py:509-602`) from the
SAME initial weights (torch init imported into flax via torch_compat) on
IDENTICAL synthetic Duke-shaped volumes, batch order, loss (CE), and Adam
schedule — final validation Dice must match within tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
    UNet,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.training.data import (
    SyntheticOCTConfig,
    synth_batch,
)
from retinal_oct_image_segmentation_via_deep_learning_tpu.utils.torch_compat import (
    import_torch_state,
)
from reference_loader import load_reference

pytestmark = pytest.mark.slow

H = W = 128
NC = 5  # background + 4 layers (thicker layers converge on CPU budgets)
FEATURES = 8
EPOCHS = 12
BATCH = 8
LR = 2e-3


def _dataset(n_train=32, n_val=16):
    cfg = SyntheticOCTConfig(height=H, width=W, num_layers=NC - 1,
                             fluid=False, seed=3)
    assert cfg.num_classes == NC
    xs, ys = [], []
    for i in range(-(-(n_train + n_val) // 16)):
        x, y = synth_batch(jax.random.fold_in(jax.random.PRNGKey(7), i),
                           16, cfg)
        xs.append(np.asarray(x))
        ys.append(np.asarray(y))
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:])


def _macro_dice(pred, lab):
    """Mean Dice over classes present in the labels (numpy)."""
    scores = []
    for c in range(NC):
        gt = lab == c
        if not gt.any():
            continue
        pr = pred == c
        inter = (gt & pr).sum()
        scores.append(2.0 * inter / (gt.sum() + pr.sum() + 1e-7))
    return float(np.mean(scores))


def _train_torch(model, train, val):
    (xt, yt), (xv, yv) = train, val
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    nll = torch.nn.NLLLoss()
    model.train()
    for _ in range(EPOCHS):
        for i in range(0, len(xt), BATCH):
            xb = torch.from_numpy(xt[i : i + BATCH].transpose(0, 3, 1, 2))
            yb = torch.from_numpy(yt[i : i + BATCH]).long()
            opt.zero_grad()
            probs = model(xb)
            loss = nll(torch.log(probs + 1e-12), yb)
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        pred = model(
            torch.from_numpy(xv.transpose(0, 3, 1, 2))
        ).argmax(1).numpy()
    return _macro_dice(pred, yv)


def _train_flax(variables, train, val, features=None):
    import optax

    (xt, yt), (xv, yv) = train, val
    model = UNet(out_channels=NC, init_features=features or FEATURES,
                 dtype=jnp.float32)
    tx = optax.adam(LR)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, xb, yb):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, xb, train=True,
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(yb, NC)
            return -jnp.mean(jnp.sum(logp * onehot, -1)), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state

    for _ in range(EPOCHS):
        for i in range(0, len(xt), BATCH):
            params, stats, opt_state = step(
                params, stats, opt_state,
                jnp.asarray(xt[i : i + BATCH]), jnp.asarray(yt[i : i + BATCH]),
            )
    logits = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(xv),
        train=False,
    )
    pred = np.asarray(jnp.argmax(logits, -1))
    return _macro_dice(pred, yv)


def test_dice_parity_synthetic_ab():
    ref = load_reference("SOTAS/Lesions_Segment/YNet_2022.py", "ref_ab")
    train, val = _dataset()

    torch.manual_seed(0)
    tm = ref.UNet(in_channels=1, out_channels=NC, init_features=FEATURES)

    fm = UNet(out_channels=NC, init_features=FEATURES, dtype=jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 1), jnp.float32))
    # identical starting point: torch init imported into flax
    variables = import_torch_state(
        variables, tm.state_dict(),
        transposed=lambda n: "upconv" in n,
    )

    dice_torch = _train_torch(tm, train, val)
    dice_flax = _train_flax(dict(variables), train, val)

    print(f"\nDice A/B: torch={dice_torch:.4f} flax={dice_flax:.4f}")
    assert dice_torch > 0.6, dice_torch  # training actually worked
    assert dice_flax > 0.6, dice_flax
    assert abs(dice_torch - dice_flax) < 0.06, (dice_torch, dice_flax)
