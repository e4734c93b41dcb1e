"""Measure the REFERENCE torch scoring chain on the host CPU, per-op.

Anchors the analytic A100 scoring baseline in README.md: runs the actual
reference FloatingRegionScore (entropy x radius, normalized, f64 radius;
reference: core/active/floating_region.py:129-217) via the geoopt/yacs
shims in tests/reference_shims.py, and times each constituent op. See
README.md "A100 baseline anchor" for the derivation from these numbers.

Run from the repo root: python benchmarks/bench_reference_cpu.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import torch
torch.set_num_threads(os.cpu_count())
from tests import reference_shims
reference_shims.install()
from core.configs import cfg  # noqa
# the reference hardcodes .cuda() in the radius branch
# (floating_region.py:193); run it on CPU for the anchor measurement.
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
from core.active.floating_region import FloatingRegionScore

H, W = 1024, 2048
torch.manual_seed(0)
logits = torch.randn(1, 19, H, W)
decoder = torch.randn(1, 64, H, W) * 0.5

score_fn = FloatingRegionScore(in_channels=19, size=3, purity_type="radius")

def timeit(fn, n=3, warm=1):
    for _ in range(warm): fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)

with torch.no_grad():
    t_full = timeit(lambda: score_fn(logits, decoder_out=decoder,
                                     normalize=True,
                                     unc_type="entropy", pur_type="radius"))
    # per-op anchors
    p = torch.softmax(logits, dim=1)
    t_softmax = timeit(lambda: torch.softmax(logits, dim=1))
    ent = torch.sum(-p * torch.log(p + 1e-6), dim=1)
    t_entropy = timeit(lambda: torch.sum(-p * torch.log(p + 1e-6), dim=1))
    conv = torch.nn.Conv2d(1, 1, 3, padding=1, bias=False)
    conv.weight.data.fill_(1.0)
    e4 = ent.unsqueeze(0)
    t_box = timeit(lambda: conv(e4))
    mapper = reference_shims
    d64 = decoder.double()
    t_dist0 = timeit(lambda: reference_shims.dist0(
        d64, k=torch.tensor(-1.0, dtype=torch.float64), dim=1))

print(f"threads={torch.get_num_threads()}")
mpx = H * W / 1e6
print(f"full chain : {t_full*1e3:9.1f} ms -> {mpx/t_full:7.2f} Mpx/s (CPU)")
print(f"softmax    : {t_softmax*1e3:9.1f} ms")
print(f"entropy    : {t_entropy*1e3:9.1f} ms")
print(f"box conv   : {t_box*1e3:9.1f} ms")
print(f"dist0 f64  : {t_dist0*1e3:9.1f} ms")
