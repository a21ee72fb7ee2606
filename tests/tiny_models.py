"""A tiny CNN bundle for fast method/metric tests."""
import flax.linen as nn
import jax
import jax.numpy as jnp

from xai_tpu.models.common import ModelBundle, ModelMeta


class TinyCNN(nn.Module):
    num_classes: int = 10
    relu: callable = nn.relu

    @nn.compact
    def __call__(self, x, taps=False, probes=None):
        tap = {}
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="c1")(x)
        x = self.relu(x)
        x = nn.Conv(16, (3, 3), strides=(2, 2), name="c2")(x)
        x = self.relu(x)
        if probes is not None and "layer4" in probes:
            x = x + probes["layer4"]
        tap["layer4"] = x
        x = x.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(x)
        if taps:
            return logits, tap
        return logits


def tiny_bundle(hw=16, num_classes=10, seed=0, batch_size=10):
    model = TinyCNN(num_classes)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, hw, hw, 3)))["params"]
    meta = ModelMeta(name="tiny", family="cnn", img_hw=hw,
                     num_classes=num_classes, batch_size=batch_size)

    def apply(p, x):
        return model.apply({"params": p}, x)

    def apply_taps(p, x):
        return model.apply({"params": p}, x, taps=True)

    def apply_probed(p, x, probes):
        return model.apply({"params": p}, x, taps=True, probes=probes)

    return ModelBundle(meta=meta, params=params, apply=apply,
                       apply_taps=apply_taps, apply_probed=apply_probed,
                       extras={"model": model})


def linear_bundle(hw=8, num_classes=4, seed=0):
    """f(x) = W @ flatten(x): IG is exact (completeness + closed form)."""
    key = jax.random.PRNGKey(seed)
    W = jax.random.normal(key, (hw * hw * 3, num_classes)) * 0.1
    meta = ModelMeta(name="linear", family="cnn", img_hw=hw,
                     num_classes=num_classes, batch_size=10)

    def apply(p, x):
        return x.reshape(x.shape[0], -1) @ p

    return ModelBundle(meta=meta, params=W, apply=apply)
