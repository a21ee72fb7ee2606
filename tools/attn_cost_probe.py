"""Where does the ViT-B bf16 forward spend its 62 ms at batch 128?

Times the attention composite (qk einsum + softmax + av einsum) and the
dense/MLP matmuls separately at the production shapes, f32 and bf16, to
size the opportunity for a fused-attention Pallas kernel."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, N, Dh, Dm = 128, 12, 197, 64, 768
L = 12


def bench(f, *args, n=10):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, N, Dh), dt)
    k = jax.random.normal(key, (B, H, N, Dh), dt)
    v = jax.random.normal(key, (B, H, N, Dh), dt)
    pet = jnp.float32 if dt == jnp.float32 else dt

    @jax.jit
    def attn_once(q, k, v):
        def blk(y, _):
            lg = jnp.einsum("bhnd,bhmd->bhnm", y, k,
                            preferred_element_type=pet) * Dh ** -0.5
            a = jax.nn.softmax(lg, axis=-1).astype(dt)
            return jnp.einsum("bhnm,bhmd->bhnd", a, v,
                              preferred_element_type=pet).astype(dt), None
        y, _ = jax.lax.scan(blk, q, None, length=L)
        return y

    @jax.jit
    def attn_nosoftmax(q, k, v):
        def blk(y, _):
            lg = jnp.einsum("bhnd,bhmd->bhnm", y, k,
                            preferred_element_type=pet) * Dh ** -0.5
            return jnp.einsum("bhnm,bhmd->bhnd", lg.astype(dt), v,
                              preferred_element_type=pet).astype(dt), None
        y, _ = jax.lax.scan(blk, q, None, length=L)
        return y

    x = jax.random.normal(key, (B * N, Dm), dt)
    w1 = jax.random.normal(key, (Dm, 4 * Dm), dt) * 0.02
    w2 = jax.random.normal(key, (4 * Dm, Dm), dt) * 0.02
    wq = jax.random.normal(key, (Dm, 3 * Dm), dt) * 0.02
    wo = jax.random.normal(key, (Dm, Dm), dt) * 0.02

    @jax.jit
    def denses(x):
        def blk(y, _):
            a = (y @ wq)[:, :Dm] @ wo.T
            h = jax.nn.gelu(y @ w1, approximate=False)
            return a + h @ w2, None
        y, _ = jax.lax.scan(blk, x, None, length=L)
        return y

    ta = bench(attn_once, q, k, v)
    tn = bench(attn_nosoftmax, q, k, v)
    td = bench(denses, x)
    fl_attn = L * B * H * (2 * N * N * Dh * 2) / 1e12
    fl_dense = L * B * N * (Dm * 3 * Dm + Dm * Dm + 2 * Dm * 4 * Dm) * 2 / 1e12
    print(f"{tag}: attn12 {ta*1e3:6.1f} ms ({fl_attn/ta:5.1f} TF/s)  "
          f"attn-no-softmax {tn*1e3:6.1f} ms  denses12 {td*1e3:6.1f} ms "
          f"({fl_dense/td:5.1f} TF/s)")
