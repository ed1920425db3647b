"""On-chip byte parity of the Pallas-NTT device quotient vs the host
C++ coset loop, via full proof bytes at small k.

Usage (serialize with other TPU jobs): python tools/quotient_probe.py
"""

import os
import sys

sys.path.insert(0, ".")

from halo2_aggregation_tpu.models import simple_example as se
from halo2_aggregation_tpu.plonk import kzg
from halo2_aggregation_tpu.plonk.keygen import keygen
from halo2_aggregation_tpu.plonk.prover_native import create_proof_native
from halo2_aggregation_tpu.plonk.verifier import verify_proof

k = 9
params = kzg.setup(k)
circuit = se.MyCircuit(constant=7, a=2, b=3)
cs_e, _, asg_e = se.build(circuit.without_witnesses(), k=k)
vk, pk = keygen(params, cs_e, asg_e)
pub = [circuit.public_output()]

_, _, asg1 = se.build(circuit, k=k)
os.environ.pop("H2A_DEVICE_QUOTIENT", None)
ref = create_proof_native(params, pk, asg1, [pub], seed=42)
print("host proof done", flush=True)

_, _, asg2 = se.build(circuit, k=k)
os.environ["H2A_DEVICE_QUOTIENT"] = "1"
os.environ["H2A_PALLAS_NTT"] = "1"
got = create_proof_native(params, pk, asg2, [pub], seed=42)
assert got == ref, "PALLAS QUOTIENT DIVERGED FROM HOST"
ok, _ = verify_proof(params, vk, [pub], got)
assert ok
print("PALLAS QUOTIENT BYTE PARITY OK (k=9, on-chip)", flush=True)

# keygen_native attaches a StaticPreload (fixed/sigma/selector parts
# shipped at keygen time) — the preloaded prove must stay byte-identical
from halo2_aggregation_tpu.plonk.keygen import keygen_native

vk_n, pk_n = keygen_native(params, cs_e, asg_e)
assert vk_n.hash_scalar() == vk.hash_scalar()
assert getattr(pk_n, "_device_static", None) is not None, (
    "keygen_native did not attach a StaticPreload on the Pallas path"
)
_, _, asg3 = se.build(circuit, k=k)
got2 = create_proof_native(params, pk_n, asg3, [pub], seed=42)
assert got2 == ref, "PRELOADED-STATIC QUOTIENT DIVERGED FROM HOST"
assert pk_n._device_static is None, "preload was not consumed"
print("STATIC-PRELOAD BYTE PARITY OK (k=9, on-chip)", flush=True)

# force the round-trip (non-keep) engine too so both coset schedules
# stay byte-pinned at this k
os.environ["H2A_DQ_KEEP_COEFFS"] = "0"
_, _, asg4 = se.build(circuit, k=k)
got3 = create_proof_native(params, pk, asg4, [pub], seed=42)
assert got3 == ref, "ROUND-TRIP QUOTIENT DIVERGED FROM HOST"
os.environ.pop("H2A_DQ_KEEP_COEFFS", None)
print("ROUND-TRIP ENGINE BYTE PARITY OK (k=9, on-chip)", flush=True)
