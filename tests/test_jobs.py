"""Checkpoint/resume aggregation driver (utils/jobs.py)."""

import os

import pytest

from halo2_aggregation_tpu.models import simple_example as se
from halo2_aggregation_tpu.plonk import kzg
from halo2_aggregation_tpu.plonk.keygen import keygen
from halo2_aggregation_tpu.plonk.prover import create_proof
from halo2_aggregation_tpu.utils.jobs import StageLogger, aggregate_checkpointed


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    params = kzg.setup(9)
    c = se.MyCircuit(constant=7, a=2, b=3)
    cs_e, _, asg_e = se.build(c.without_witnesses(), k=9)
    vk, pk = keygen(params, cs_e, asg_e)
    proofs, insts = [], []
    for a, b in [(2, 3), (4, 5)]:
        cc = se.MyCircuit(constant=7, a=a, b=b)
        _, _, asg = se.build(cc, k=9)
        pub = [cc.public_output()]
        proofs.append(create_proof(params, pk, asg, [pub], seed=80 + a))
        insts.append([pub])
    B = 4
    pl = [proofs[i % 2] for i in range(B)]
    il = [insts[i % 2] for i in range(B)]
    ckpt = str(tmp_path / "agg.jsonl")
    logp = str(tmp_path / "stages.jsonl")

    # full run, chunk=2 -> 2 chunks
    ok, quads = aggregate_checkpointed(
        params, vk, il, pl, ckpt, chunk=2, logger=StageLogger(logp)
    )
    assert ok and len(quads) == B
    assert os.path.getsize(logp) > 0

    # simulate a crash after chunk 0: drop the second checkpoint line
    lines = open(ckpt).read().strip().split("\n")
    assert len(lines) == 2
    open(ckpt, "w").write(lines[0] + "\n")
    ok2, quads2 = aggregate_checkpointed(params, vk, il, pl, ckpt, chunk=2)
    assert ok2 and quads2 == quads

    # changed input invalidates the stale entry (recompute, still correct)
    pl_swapped = [pl[1], pl[0], pl[2], pl[3]]
    il_swapped = [il[1], il[0], il[2], il[3]]
    ok3, quads3 = aggregate_checkpointed(
        params, vk, il_swapped, pl_swapped, str(tmp_path / "agg2.jsonl"), chunk=2
    )
    assert ok3
    assert quads3[0] == quads[1] and quads3[1] == quads[0]
