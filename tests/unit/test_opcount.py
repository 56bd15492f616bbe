"""Smoke test for the fused-kernel op-count audit tool (VERDICT r4 next
#3). The audit numbers for config #3 are quoted in docs/STATUS.md round 5;
this keeps the tool executable so they can be regenerated after any kernel
change."""

import numpy as np


def test_opcount_audit_runs_and_accounts():
    from climate_model_tpu.bench.opcount import audit_substep

    a = audit_substep(1, which="corrector", with_phys=True)
    assert a.total_arith > 0 and a.total_moves > 0
    assert a.n_tiles >= 2
    # region totals must account for (nearly) all arithmetic — a kernel
    # reorganization that moves work outside the labeled line ranges shows
    # up here as unlabeled lines taking a big share
    labeled = sum(v for k, v in a.region_elems.items()
                  if not k.startswith("(line"))
    assert labeled > 0.9 * a.total_arith, (labeled, a.total_arith)
    # redundancy is a ceiling, and for this hand-CSE'd kernel a small one
    assert 0 <= a.redundant_elems < 0.1 * a.total_arith
    assert "TOTAL" in a.table()
    # predictor == corrector dynamics in arithmetic content (same math)
    p = audit_substep(1, which="predictor")
    c = audit_substep(1, which="corrector", with_phys=False)
    assert abs(p.total_arith - c.total_arith) < 0.01 * c.total_arith
