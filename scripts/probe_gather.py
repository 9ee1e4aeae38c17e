"""Measure image-space row-gather cost on the TPU via in-jit lax.scan repeats
(the only reliable micro-measurement on this tunnel — PERF_NOTES).

The textured decode is gather-bound (mat_rows 4.5 ms + taps 3.5 ms at sponza,
trace r5); this probe pins the per-row price so the redesign targets the real
lever (row count? lane width? dtype? index layout?).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

rng = np.random.default_rng(0)
REP = 30

def timeit(body, *args):
    """Time REP executions of body inside one jit via lax.scan; return ms/exec.
    A serial carry perturbs the inputs each iteration so XLA cannot hoist the
    loop-invariant body out of the scan (it did — first version measured 0)."""
    @jax.jit
    def run(*a):
        def step(c, _):
            out = body(c, *a)
            s = jnp.sum(out[..., 0] if out.ndim > 1 else out)
            return (s.astype(jnp.int32) & 1), None
        s, _ = jax.lax.scan(step, jnp.int32(0), None, length=REP)
        return s
    jax.device_get(run(*args))  # block_until_ready does NOT serialize on this
    ts = []                     # tunnel (PERF_NOTES) — device_get must
    for _ in range(5):
        t0 = time.perf_counter(); jax.device_get(run(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2] * 1e3 / REP

TAB = 131072
for n_rows, w, dt in [
    (518400, 32, jnp.float32),
    (518400, 16, jnp.float32),
    (518400, 8, jnp.float32),
    (518400, 4, jnp.float32),
    (518400, 1, jnp.float32),
    (518400, 32, jnp.bfloat16),
    (129600, 32, jnp.float32),
    (2073600, 4, jnp.float32),
]:
    tab = jnp.asarray(rng.normal(size=(TAB, w)).astype(np.float32)).astype(dt)
    idx = jnp.asarray(rng.integers(0, TAB, size=(n_rows,)).astype(np.int32))
    t = timeit(lambda c, tab, idx: (tab[jnp.minimum(idx + c, TAB - 1)]).astype(jnp.float32), tab, idx)
    print(f"rows={n_rows:8d} w={w:3d} {dt.__name__:9s}: {t:7.3f} ms  ({t*1e6/n_rows:6.2f} ns/row)", flush=True)

# small-table gathers: does table size matter?
for tabsz in (64, 1024, 16384, 131072):
    tab = jnp.asarray(rng.normal(size=(tabsz, 32)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, tabsz, size=(518400,)).astype(np.int32))
    t = timeit(lambda c, tab, idx: tab[jnp.minimum(idx + c, tabsz - 1)], tab, idx)
    print(f"table={tabsz:7d} rows=518400 w=32: {t:7.3f} ms", flush=True)

# one-hot matmul alternative for small tables
for M in (32, 64, 256):
    tab24 = jnp.asarray(rng.normal(size=(M, 32)).astype(np.float32))
    midx = jnp.asarray(rng.integers(0, M, size=(540, 960)).astype(np.int32))
    def onehot_mm(c, tab, mi):
        oh = (jnp.minimum(mi[..., None] + c, M - 1) == jnp.arange(M)).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, tab.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    t = timeit(onehot_mm, tab24, midx)
    print(f"one-hot matmul (540,960)x{M} -> 32 lanes: {t:7.3f} ms", flush=True)

# atlas 2x2 tap gather (the sampling.py pattern): (A*A, 16) table, half-res rows
A = 1024
taps_tab = jnp.asarray(rng.normal(size=(A * A, 16)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, A * A, size=(518400,)).astype(np.int32))
t = timeit(lambda c, tab, idx: tab[jnp.minimum(idx + c, A * A - 1)], taps_tab, idx)
print(f"atlas taps (1M,16) rows=518400: {t:7.3f} ms", flush=True)

# slot-row table variants (the sponza textured decode, r5): 518k-row gather
print("\n-- slot-row table variants --")
for tabsz, w, dt in [(131072, 32, jnp.float32), (262144, 32, jnp.float32),
                     (393216, 32, jnp.float32), (393216, 32, jnp.float16),
                     (393216, 24, jnp.float16), (393216, 4, jnp.int32)]:
    tab = jnp.asarray(rng.normal(size=(tabsz, w)).astype(np.float32)).astype(dt)
    idx = jnp.asarray(rng.integers(0, tabsz, size=(518400,)).astype(np.int32))
    t = timeit(lambda c, tab, idx: (tab[jnp.minimum(idx + c, tabsz - 1)]).astype(jnp.float32), tab, idx)
    print(f"table=({tabsz:7d},{w:2d}) {dt.__name__:8s}: {t:7.3f} ms", flush=True)
# two-level: (N,4) int gather -> 256-row material table gather
tab4 = jnp.asarray(rng.integers(0, 256, size=(393216, 4)).astype(np.int32))
mtab = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 393216, size=(518400,)).astype(np.int32))
def two_level(c, tab4, mtab, idx):
    r4 = tab4[jnp.minimum(idx + c, 393215)]
    return mtab[r4[:, 0]]
t = timeit(two_level, tab4, mtab, idx)
print(f"two-level (w4 int + 256-row): {t:7.3f} ms", flush=True)
