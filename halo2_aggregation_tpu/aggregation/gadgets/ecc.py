"""EccChip: in-circuit BN254 G1 arithmetic over RNS integers.

Re-design of halo2wrong's `BaseFieldEccChip` (SURVEY.md §2b) — the
reference's dominant cost center (`mul_var`,
`/root/reference/src/multiopen.rs:393`): points are pairs of
AssignedIntegers (affine coordinates, never the identity); add/double use
witnessed slopes pinned by `assert_mul_equals` (one mul-sized constraint,
no canonical reductions), and `mul_var` is a double-and-add ladder whose
per-step "zero addend" is a fixed constant point, so the final correction
is a host-computable CONSTANT — no witness-dependent cleanup
(the identity never appears, keeping the incomplete formulas safe).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from ...fields import CURVE_B, Q, R
from ...oracle import curve as oc
from .integer import AssignedInteger, IntegerChip
from .main_gate import AssignedValue, Ctx, MainGate, Term


@dataclass
class AssignedPoint:
    """Affine in-circuit point (excluded: the identity)."""

    x: AssignedInteger
    y: AssignedInteger

    def value(self):
        xv, yv = self.x.value(), self.y.value()
        if xv is None or yv is None:
            return None
        return (xv % Q, yv % Q)


#: ladder constants: acc seed and the 0-digit addend.  Any fixed points
#: work (soundness never depends on them; they cancel via the constant
#: correction).
ACC_INIT = oc.g1_mul(oc.g1_generator(), 0xACC0)
ZERO_ADDEND = oc.g1_mul(oc.g1_generator(), 0x0FF5E7)


class EccChip:
    def __init__(self, integer_chip: IntegerChip):
        self.ic = integer_chip
        self.mg = integer_chip.mg

    # -- assignment ----------------------------------------------------------
    def _assert_on_curve(self, ctx, p: "AssignedPoint"):
        y2 = self.ic.square(ctx, p.y)
        x2 = self.ic.square(ctx, p.x)
        rhs = self.ic.add(ctx, self.ic.assign_constant(ctx, CURVE_B),
                          self.ic.mul(ctx, x2, p.x))
        # y^2 - x^3 - b = 0 (mod p): assert via mul-equals on y*y = rhs
        self.ic.assert_mul_equals(ctx, p.y, p.y, rhs)

    def assign_point(self, ctx: Ctx, p) -> AssignedPoint:
        """Witness an affine point, constrained to the curve."""
        x = self.ic.assign_integer(ctx, None if p is None else p[0])
        y = self.ic.assign_integer(ctx, None if p is None else p[1])
        pt = AssignedPoint(x, y)
        self._assert_on_curve(ctx, pt)
        return pt

    def assign_constant_point(self, ctx: Ctx, p) -> AssignedPoint:
        return AssignedPoint(
            self.ic.assign_constant(ctx, p[0]), self.ic.assign_constant(ctx, p[1])
        )

    def assign_point_from_cells(self, ctx, x_cells, y_cells) -> AssignedPoint:
        """Build a point from 8 existing limb cells (instance column copies)
        — the reference's `assign_point_from_instance`
        (verifier.rs:200-225)."""
        x = self.ic.assign_from_cells(ctx, x_cells)
        y = self.ic.assign_from_cells(ctx, y_cells)
        pt = AssignedPoint(x, y)
        self._assert_on_curve(ctx, pt)
        return pt

    # -- group law -----------------------------------------------------------
    def add_incomplete(self, ctx, p: AssignedPoint, q: AssignedPoint) -> AssignedPoint:
        """p + q for p != +-q.

        lambda*(x2 - x1) = y2 - y1 with a witnessed inverse of (x2 - x1)
        making x1 == x2 unsatisfiable; then
        x3 = lambda^2 - x1 - x2,  y3 = lambda*(x1 - x3) - y1."""
        ic = self.ic
        dx = ic.sub(ctx, q.x, p.x)
        dy = ic.sub(ctx, q.y, p.y)
        pv, qv = p.value(), q.value()
        if pv is None or qv is None:
            lam_v = inv_v = None
        else:
            dxv = (qv[0] - pv[0]) % Q
            assert dxv != 0, "add_incomplete on equal x-coordinates"
            inv_v = pow(dxv, -1, Q)
            lam_v = (qv[1] - pv[1]) * inv_v % Q
        # dx != 0
        inv_dx = ic.assign_integer(ctx, inv_v)
        one = ic.assign_constant(ctx, 1)
        ic.assert_mul_equals(ctx, dx, inv_dx, one)
        # slope
        lam = ic.assign_integer(ctx, lam_v)
        ic.assert_mul_equals(ctx, lam, dx, dy)
        # x3: lambda^2 = x3 + x1 + x2
        x3_v = None if lam_v is None else (lam_v * lam_v - pv[0] - qv[0]) % Q
        x3 = ic.assign_integer(ctx, x3_v)
        sum_x = ic.add(ctx, ic.add(ctx, x3, p.x), q.x)
        ic.assert_mul_equals(ctx, lam, lam, sum_x)
        # y3: lambda*(x1 - x3) = y3 + y1
        y3_v = None if lam_v is None else (lam_v * (pv[0] - x3_v) - pv[1]) % Q
        y3 = ic.assign_integer(ctx, y3_v)
        x1_sub_x3 = ic.sub(ctx, p.x, x3)
        sum_y = ic.add(ctx, y3, p.y)
        ic.assert_mul_equals(ctx, lam, x1_sub_x3, sum_y)
        return AssignedPoint(x3, y3)

    def double(self, ctx, p: AssignedPoint) -> AssignedPoint:
        """2p: lambda*(2y) = 3x^2.  y == 0 cannot occur for points on this
        curve (the group order is odd, so there is no 2-torsion)."""
        ic = self.ic
        x2 = ic.square(ctx, p.x)
        three_x2 = ic.add(ctx, ic.add(ctx, x2, x2), x2)
        two_y = ic.add(ctx, p.y, p.y)
        pv = p.value()
        if pv is None:
            lam_v = None
        else:
            lam_v = 3 * pv[0] * pv[0] * pow(2 * pv[1] % Q, -1, Q) % Q
        lam = ic.assign_integer(ctx, lam_v)
        ic.assert_mul_equals(ctx, lam, two_y, three_x2)
        x3_v = None if lam_v is None else (lam_v * lam_v - 2 * pv[0]) % Q
        x3 = ic.assign_integer(ctx, x3_v)
        sum_x = ic.add(ctx, ic.add(ctx, x3, p.x), p.x)
        ic.assert_mul_equals(ctx, lam, lam, sum_x)
        y3_v = None if lam_v is None else (lam_v * (pv[0] - x3_v) - pv[1]) % Q
        y3 = ic.assign_integer(ctx, y3_v)
        x1_sub_x3 = ic.sub(ctx, p.x, x3)
        sum_y = ic.add(ctx, y3, p.y)
        ic.assert_mul_equals(ctx, lam, x1_sub_x3, sum_y)
        return AssignedPoint(x3, y3)

    def neg(self, ctx, p: AssignedPoint) -> AssignedPoint:
        return AssignedPoint(p.x, self.ic.neg(ctx, p.y))

    def assert_equal(self, ctx, p: AssignedPoint, q: AssignedPoint):
        """The reference's `ecc_chip.assert_equal` (verifier.rs:751-754)."""
        self.ic.assert_equal(ctx, p.x, q.x)
        self.ic.assert_equal(ctx, p.y, q.y)

    # -- selection ------------------------------------------------------------
    def select(self, ctx, bit: AssignedValue, p: AssignedPoint, q: AssignedPoint) -> AssignedPoint:
        """bit ? p : q, limb-wise: out = b*p_i + (1-b)*q_i per limb."""

        def sel_int(a: AssignedInteger, b_int: AssignedInteger) -> AssignedInteger:
            cells, maxes = [], []
            for i in range(4):
                av, bv = a.limbs[i].value, b_int.limbs[i].value
                ov = None
                if av is not None and bv is not None and bit.value is not None:
                    ov = (bv + bit.value * (av - bv)) % R
                # bit*a_i - bit*b_i + b_i - out = 0
                cells5 = self.mg.combine(
                    ctx,
                    [
                        Term.from_assigned(bit, 0),
                        Term.from_assigned(a.limbs[i], 0),
                        Term.from_assigned(bit, 0),
                        Term.from_assigned(b_int.limbs[i], 1),
                        Term.unassigned(ov, R - 1),
                    ],
                    mul_ab=1,
                    mul_cd=R - 1,
                )
                cells.append(cells5[4])
                maxes.append(max(a.max_vals[i], b_int.max_vals[i]))
            native = self.ic._native_of_limbs(ctx, cells)
            return AssignedInteger(cells, native, maxes)

        return AssignedPoint(sel_int(p.x, q.x), sel_int(p.y, q.y))

    # -- scalar multiplication -------------------------------------------------
    def scalar_bits(self, ctx, scalar: AssignedValue, nbits: int) -> List[AssignedValue]:
        """Witness the bit decomposition of a native scalar cell and
        constrain its recomposition."""
        sv = scalar.value
        bits_v = [None] * nbits if sv is None else [(sv >> i) & 1 for i in range(nbits)]
        cells = [self.mg.assign_bit(ctx, b) for b in bits_v]
        terms = [Term.from_assigned(c, pow(2, i, R)) for i, c in enumerate(cells)]
        terms.append(Term.from_assigned(scalar, R - 1))
        self.ic.combine_chain(ctx, terms)
        return cells

    def mul_var(
        self, ctx, p: AssignedPoint, scalar: AssignedValue, nbits: int = 254
    ) -> AssignedPoint:
        """Variable-base scalar mul (the reference's `mul_var`).

        MSB-first ladder: acc starts at the constant ACC_INIT; each step
        doubles and adds select(bit, p + Z, Z) where Z = ZERO_ADDEND is a
        constant.  Every step adds *something*, so the junk contribution is
        the CONSTANT  2^nbits * ACC_INIT + (2^nbits - 1) * Z,  which we
        subtract at the end.  Scalars with s*P in the span of the constants
        are astronomically unlikely, so incomplete adds stay safe for
        honest witnesses."""
        bits = self.scalar_bits(ctx, scalar, nbits)
        z_const = self.assign_constant_point(ctx, ZERO_ADDEND)
        p_plus_z = self.add_incomplete(ctx, p, z_const)
        acc = self.assign_constant_point(ctx, ACC_INIT)
        for i in range(nbits - 1, -1, -1):
            acc = self.double(ctx, acc)
            addend = self.select(ctx, bits[i], p_plus_z, z_const)
            acc = self.add_incomplete(ctx, acc, addend)
        # constant correction
        corr = oc.g1_add(
            oc.g1_mul(ACC_INIT, 1 << nbits),
            oc.g1_mul(ZERO_ADDEND, (1 << nbits) - 1),
        )
        neg_corr = self.assign_constant_point(ctx, oc.g1_neg(corr))
        return self.add_incomplete(ctx, acc, neg_corr)
