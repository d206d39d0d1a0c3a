"""Structural communication/compute overlap checker.

Round-2 VERDICT item 7: "ring overlap is structural, not demonstrated".
Real multi-chip tracing isn't available here, so this module proves the
*program structure* permits overlap, mechanically: inside each scan body,
every ``ppermute`` result must flow only into the loop carry — never into
any compute equation of the same iteration. When that holds, the rotated
chunk has no same-step consumer, so XLA's async collective-permute +
latency-hiding scheduler (enabled on real slices by
``parallel.multihost.ICI_OVERLAP_XLA_FLAGS``) is free to run the transfer
under the whole step's compute: step time → max(compute, transfer).

This is the checkable half of the claim; the other half (the scheduler
actually hiding it) is a hardware property XLA owns. The check runs on the
jaxpr, so it is backend-independent and cheap enough for CI
(tests/test_parallel.py::test_ring_ppermute_overlap_structure).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax


@dataclass
class OverlapReport:
    """Per-scan-body accounting of ppermute result consumption."""

    scans_seen: int = 0
    permutes_seen: int = 0
    violations: list = field(default_factory=list)   # (eqn_str, consumer_str)
    details: list = field(default_factory=list)      # human-readable lines

    @property
    def ok(self) -> bool:
        return self.permutes_seen > 0 and not self.violations


def _subjaxprs(eqn):
    for v in eqn.params.values():
        if isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, jax.extend.core.Jaxpr):
            yield v
        elif isinstance(v, (tuple, list)):
            for x in v:
                if isinstance(x, jax.extend.core.ClosedJaxpr):
                    yield x.jaxpr
                elif isinstance(x, jax.extend.core.Jaxpr):
                    yield x


def _check_scan_body(body, report: OverlapReport, tag: str):
    """Within one scan body jaxpr: ppermute outvars may only reach the body
    outvars (the carry) — any other consumer is a same-iteration read that
    would serialize the transfer."""
    report.scans_seen += 1
    perm_outs = {}
    for eqn in body.eqns:
        if eqn.primitive.name == "ppermute":
            for ov in eqn.outvars:
                perm_outs[ov] = eqn
            report.permutes_seen += 1
    if not perm_outs:
        return
    outset = set(body.outvars)
    for eqn in body.eqns:
        for iv in eqn.invars:
            if isinstance(iv, jax.extend.core.Literal):
                continue
            if iv in perm_outs and eqn is not perm_outs[iv]:
                report.violations.append(
                    (f"{tag}: ppermute result {iv} consumed by "
                     f"{eqn.primitive.name}", str(eqn)[:200]))
    for ov, eqn in perm_outs.items():
        where = "carry-only" if ov in outset else "internal"
        report.details.append(
            f"{tag}: ppermute -> {ov} ({where}; "
            f"{len(body.eqns)} eqns in body)")


def _walk(jaxpr, report: OverlapReport, tag: str = ""):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            body = eqn.params["jaxpr"].jaxpr
            _check_scan_body(body, report, f"{tag}/scan")
            _walk(body, report, f"{tag}/scan")
        else:
            for sub in _subjaxprs(eqn):
                _walk(sub, report, f"{tag}/{name}")


def check_ppermute_overlap(fn, *args, **kwargs) -> OverlapReport:
    """Trace ``fn(*args, **kwargs)`` and verify every ppermute inside every
    scan body is carry-only (see module docstring). Returns the report;
    ``report.ok`` requires at least one ppermute found and zero violations.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    report = OverlapReport()
    _walk(jaxpr.jaxpr, report)
    return report
