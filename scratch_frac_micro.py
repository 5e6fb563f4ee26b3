"""Scratch: micro-profile of fractional_decimator_block(5.0) internals at
240k samples — which op eats the ~50 us?"""
import numpy as np
import jax
import jax.numpy as jnp
from csdr_tpu.utils.timing import time_kernel

rng = np.random.default_rng(0)
n = 240_000
margin = 21
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
tail = jnp.zeros((margin,), jnp.float32)
occ = jnp.int32(0)
where = jnp.float32(5.0)
rate = 5.0
r_int = 5
p = 12
cap = int(n / rate) + 2
pad_extra = max(16, cap * r_int - n + p + 0 + r_int + 16)

KP = (256, 2048)

def t(name, fn, xin):
    per = time_kernel(fn, xin, k_pair=KP)
    print(f"{name:44s} {per*1e6:8.1f} us", flush=True)

# a) concat only
t("concat tail+x+pad", lambda xi: jnp.concatenate(
    [tail, xi, jnp.zeros((pad_extra,), jnp.float32)]), x)

# b) concat + traced-start dynamic_slice
def b(xi):
    xcat = jnp.concatenate([tail, xi, jnp.zeros((pad_extra,), jnp.float32)])
    s0 = jnp.ceil(where + xi[0] * 1e-30).astype(jnp.int32) + 6 + (margin - occ)
    return jax.lax.dynamic_slice(xcat, (s0,), (cap * r_int,))
t("concat + traced dynamic_slice", b, x)

# c) + reshape/one-hot matvec
def c(xi):
    win = b(xi)
    e0 = jnp.zeros((r_int,), jnp.float32).at[0].set(1.0)
    return jnp.dot(win.reshape(cap, r_int), e0,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
t("concat + dslice + one-hot matvec", c, x)

# d) the validity/count tail math alone
def d(xi):
    k = jnp.arange(cap, dtype=jnp.float32)
    wh = where + xi[0] * 1e-30 + k * jnp.float32(rate)
    index_high = jnp.ceil(wh).astype(jnp.int32)
    valid = index_high + p < occ + n
    y = jnp.where(valid, xi[:cap], 0.0)
    count = jnp.sum(valid.astype(jnp.int32))
    return y.sum() + count.astype(jnp.float32)
t("validity mask + count", d, x)

# e) full block apply
from csdr_tpu.ops import resamp
blk = resamp.fractional_decimator_block(5.0)
st = blk.apply(blk.init(), x)[0]
t("full block apply", lambda xi: blk.apply(st, xi)[1].data, x)

# f) one-hot matvec on a STATIC slice (no traced start)
def f(xi):
    xcat = jnp.concatenate([tail, xi, jnp.zeros((pad_extra,), jnp.float32)])
    win = jax.lax.slice_in_dim(xcat, 8, 8 + cap * r_int)
    e0 = jnp.zeros((r_int,), jnp.float32).at[0].set(1.0)
    return jnp.dot(win.reshape(cap, r_int), e0,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
t("static slice + one-hot matvec", f, x)
