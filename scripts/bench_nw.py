import sys, time
sys.path.insert(0,'/root/repo')
import numpy as np
from mindthegap_tpu.ops import nw
from mindthegap_tpu.ops.nw_device import nw_identity_device

rng = np.random.default_rng(3)
def rand_seq(n): return "".join(rng.choice(list("ACGT"), size=n))

# correctness on TPU-compiled kernel, small sizes
pairs = [(rand_seq(int(rng.integers(5,150))), rand_seq(int(rng.integers(5,150)))) for _ in range(8)]
dev = nw_identity_device(pairs)
nat = [nw.nw_identity(a,b) for a,b in pairs]
assert all(abs(d-n) < 1e-12 for d,n in zip(dev,nat)), (dev, nat)
print("TPU-compiled kernel correct on small pairs")

# long-pair benchmark: 16 pairs of 8kb (typical -max-length scale)
N = 8000
a = rand_seq(N)
longpairs = []
for _ in range(16):
    b = list(a)
    for _ in range(200):
        p = int(rng.integers(0, len(b))); b[p] = rng.choice(list("ACGT"))
    longpairs.append((a, "".join(b)))

t0=time.perf_counter(); dev = nw_identity_device(longpairs); t_compile=time.perf_counter()-t0
t0=time.perf_counter(); dev = nw_identity_device(longpairs); t_dev=time.perf_counter()-t0
t0=time.perf_counter(); nat = [nw.nw_identity(p[0],p[1]) for p in longpairs]; t_nat=time.perf_counter()-t0
assert all(abs(d-n) < 1e-12 for d,n in zip(dev,nat))
cells = sum(len(p[0])*len(p[1]) for p in longpairs)
print(f"16x 8kb pairs ({cells/1e9:.2f} Gcells): device {t_dev:.2f}s ({cells/t_dev/1e9:.1f} Gcells/s, compile {t_compile:.1f}s) vs native C++ {t_nat:.2f}s ({cells/t_nat/1e9:.2f} Gcells/s) -> {t_nat/t_dev:.1f}x")
