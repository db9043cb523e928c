import numpy as np, jax.numpy as jnp
from gaussdca_tpu.ops import distance
rng = np.random.default_rng(0)
M, N = 2048, 4096
Z = jnp.asarray(rng.integers(1, 22, size=(M, N), dtype=np.int8))
th = jnp.asarray(0.2 * N, jnp.float32)
for name, fn in (("sym", distance.row_stats_sym_pallas),
                 ("full", distance.row_stats_pallas)):
    try:
        rs, _ = fn(Z, th, 21)
        print(name, "ok", float(np.asarray(rs[0])))
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "vmem" in l.lower() or "Mosaic" in l or "exceeded" in l]
        print(name, "FAILED:", (key[0] if key else msg[:200])[:300])
