"""SingleProofCircuit: the outer aggregation circuit.

Re-creation of the reference's driver circuit
(`/root/reference/examples/simple-example.rs:445-533`): wraps VerifierChip
so that "inner proof P verifies under vk V" becomes a provable statement,
with public inputs [limbs(inst_comm), limbs(e), limbs(f), limbs(w),
limbs(zw)] — 8 scalars per point, 40 total
(simple-example.rs:535-548, :668-671).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from ..aggregation.chips import VerifierChip
from ..aggregation.gadgets.ecc import EccChip
from ..aggregation.gadgets.integer import IntegerChip, value_to_limbs
from ..aggregation.gadgets.main_gate import Ctx, MainGate
from ..aggregation.gadgets.range_chip import RangeChip
from ..plonk.circuit import Assignment, ConstraintSystem
from ..plonk.keygen import VerifyingKey
from ..utils.transcript import Blake2bRead


def point_to_scalars(p) -> List[int]:
    """4 x-limbs then 4 y-limbs of 68 bits (simple-example.rs:535-548)."""
    x, y = p
    return value_to_limbs(x) + value_to_limbs(y)


@dataclass
class SingleProofConfig:
    mg: MainGate
    rc: RangeChip
    ic: IntegerChip
    ecc: EccChip
    instance_col: object


def configure(cs: ConstraintSystem) -> SingleProofConfig:
    instance_col = cs.instance_column()
    cs.enable_equality(instance_col)
    mg_cfg = MainGate.configure(cs)
    mg = MainGate(mg_cfg)
    rc_cfg = RangeChip.configure(cs, mg_cfg)
    rc = RangeChip(mg, rc_cfg)
    ic = IntegerChip(mg, rc)
    ecc = EccChip(ic)
    return SingleProofConfig(mg, rc, ic, ecc, instance_col)


@dataclass
class SingleProofCircuit:
    """log_n/vk/transcript mirror the reference struct
    (simple-example.rs:445-461); transcript None => keygen shape."""

    inner_vk: VerifyingKey
    proof: Optional[bytes]
    num_proofs: int = 1
    mul_nbits: int = 254

    def without_witnesses(self) -> "SingleProofCircuit":
        return SingleProofCircuit(self.inner_vk, None, self.num_proofs, self.mul_nbits)

    def public_inputs(self, inst_comm, efw) -> List[int]:
        out = list(point_to_scalars(inst_comm))
        for p in efw:
            out.extend(point_to_scalars(p))
        return out

    def synthesize(self, cs: ConstraintSystem, cfg: SingleProofConfig, asg: Assignment):
        cfg.rc.load_table(asg)
        ctx = Ctx(asg)
        transcript = None if self.proof is None else Blake2bRead(self.proof)
        chip = VerifierChip(
            cfg.mg, cfg.ecc, self.inner_vk, transcript, self.mul_nbits
        )
        quad, _verdict = chip.verify_proof(ctx, cfg.instance_col)
        return ctx, quad


def build(circuit: SingleProofCircuit, k: int, public_inputs=None):
    """configure + synthesize; returns (cs, cfg, assignment, ctx, quad)."""
    cs = ConstraintSystem()
    cfg = configure(cs)
    asg = Assignment(cs, 1 << k)
    if public_inputs is not None:
        asg.set_instance(cfg.instance_col, public_inputs)
    ctx, quad = circuit.synthesize(cs, cfg, asg)
    return cs, cfg, asg, ctx, quad
