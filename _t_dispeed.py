import time
import numpy as np, jax.numpy as jnp
from gaussdca_tpu.api import _scores_jit
rng = np.random.default_rng(0)
for M, N in ((5000, 200), (1024, 400)):
    q = 21
    args = dict(q=q, score="DI", theta_is_auto=False, dtype_name="float32", use_pallas=True)
    Zs = [jnp.asarray(rng.integers(1, q+1, size=(M, N), dtype=np.int8)) for _ in range(4)]
    def run(Zi):
        S, th, meff = _scores_jit(Zi, jnp.asarray(0.2, jnp.float32), jnp.asarray(0.2, jnp.float32), **args)
        return float(np.asarray(S[0,1]))
    run(Zs[0]); ts=[]
    for Zi in Zs[1:]:
        t0=time.perf_counter(); run(Zi); ts.append(time.perf_counter()-t0)
    print(f"M={M} N={N} DI fused: {np.median(ts):.3f}s (was {'0.157' if N==200 else '0.621'})")
