import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import jax, jax.numpy as jnp, numpy as np
from xai_tpu.models import resnet
from xai_tpu.ops.quickshift_jax import _parents_batch, parents_to_labels_batch

bundle = resnet.make_bundle("resnet50")
rs = np.random.RandomState(0)
imgs = jnp.asarray(rs.rand(4, 224, 224, 3).astype(np.float32))
B = 4; S = 1000; F = 512; chunk = 64

def timed(tag, fn, n=4):
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{tag}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)
    return r

w, wd = 12, 12
qs = jax.jit(lambda im: _parents_batch(im, w, wd, jnp.float32(0.2),
                                       jnp.float32(1/32.0),
                                       jnp.float32(200.0*200.0)),
             static_argnums=())
parents = timed("quickshift parents", lambda: qs(imgs))

lab = jax.jit(lambda p: parents_to_labels_batch(p))
labels, counts = timed("labels (16-jump+cumsum)", lambda: lab(parents))

keys = jnp.asarray(np.stack([np.asarray(jax.random.PRNGKey(i))
                             for i in range(B)]), jnp.uint32)

@jax.jit
def samp(keys, counts):
    def one(k, cnt):
        key = jax.random.wrap_key_data(k, impl="threefry2x32")
        r = jax.random.randint(key, (S, F), 0, 2, dtype=jnp.int32).astype(jnp.int8)
        colok = (jnp.arange(F) < cnt).astype(jnp.int8)
        return (r * colok).at[0].set(colok)
    return jax.vmap(one)(keys, counts)
rows = timed("sampling", lambda: samp(keys, counts))

p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, bundle.params)

@functools.partial(jax.jit, static_argnums=())
def score(params, imgs, labels, rows):
    oh = jax.nn.one_hot(labels, F, dtype=jnp.bfloat16)
    imgs_c = imgs.astype(jnp.bfloat16)
    fudged = jnp.zeros_like(imgs_c)
    H = W = 224
    def one(rows_c):
        on = jnp.einsum("bcf,bnf->bcn", rows_c.astype(jnp.bfloat16), oh).reshape(B, -1, H, W)
        xb = jnp.where(on[..., None] > 0.5, imgs_c[:, None], fudged[:, None])
        flat = xb.reshape((-1,) + xb.shape[2:])
        pr = jax.nn.softmax(bundle.apply(params, flat).astype(jnp.float32), -1)
        return pr.reshape(B, rows_c.shape[1], -1)
    pad = (-S) % chunk
    rows_p = jnp.concatenate([rows, jnp.zeros((B, pad, F), jnp.int8)], 1)
    probs = jax.lax.map(one, rows_p.reshape(B, (S+pad)//chunk, chunk, F).transpose(1, 0, 2, 3))
    probs = probs.transpose(1, 0, 2, 3).reshape(B, S+pad, -1)[:, :S]
    cls = jnp.argmax(probs[:, 0, :], axis=-1)
    return jax.vmap(lambda p, l: p[:, l])(probs, cls)
y = timed("scoring sweep bf16 (4000 fwd)", lambda: score(p16, imgs, labels, rows), n=2)

@jax.jit
def ridge_all(rows, y, counts):
    def ridge(r, yb, cnt):
        X = r.astype(jnp.float32)
        nrm = jnp.linalg.norm(X, axis=1)
        cos = (X @ (jnp.arange(F) < cnt).astype(jnp.float32)) / \
            jnp.maximum(nrm * jnp.sqrt(cnt.astype(jnp.float32)), 1e-12)
        wgt = jnp.sqrt(jnp.exp(-((1.0 - cos) ** 2) / 0.25 ** 2))
        wsum = wgt.sum()
        xm = (X * wgt[:, None]).sum(0) / wsum
        ym = (yb * wgt).sum() / wsum
        sw = jnp.sqrt(wgt)
        Xc = (X - xm) * sw[:, None]
        yc = (yb - ym) * sw
        A = Xc.T @ Xc + jnp.eye(F, dtype=jnp.float32)
        return jax.scipy.linalg.solve(A, Xc.T @ yc, assume_a="pos")
    return jax.vmap(ridge)(rows, y, counts)
coef = timed("ridge solve", lambda: ridge_all(rows, y, counts))
print("counts:", np.asarray(counts), flush=True)
