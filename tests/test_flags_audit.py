"""FLAGS.md stays honest: every flag a `yes` row claims must exist in the
source (round-2 review found a claimed-but-unimplemented `--p-split`)."""

import os

from tpulamm.tools.audit_flags import audit, claimed_flags

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flags_md_claims_are_real():
    problems = audit(os.path.join(ROOT, "FLAGS.md"))
    assert not problems, "\n".join(problems)


def test_claimed_flags_sees_embedded_flags():
    # the round-2 false row embedded the flag inside a path span
    assert claimed_flags("`cli/speculative.py --p-split`") == ["--p-split"]
    assert claimed_flags("`-ns/--n-sequences/--sequences`") == [
        "-ns", "--n-sequences", "--sequences"]
    assert claimed_flags("plain prose --not-a-claim") == []
