"""Regenerate the FROZEN EXPECTED table in fixtures/audio_fixtures.py
from the live operators. Run ONLY on an intentional decode/features
semantics change; the driver oracle and tests/test_audio_fixtures.py
both compare against the frozen literals."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from go_pkg_spider_spark.fixtures import audio_fixtures as ax

PATH = "go_pkg_spider_spark/fixtures/audio_fixtures.py"


def main() -> None:
    rows = ax.derive_expected()
    lines = ",\n".join("    " + repr(r) for r in rows)
    block = (
        "EXPECTED: list[tuple] = [\n" + lines + ",\n]\n"
    )
    src = open(PATH).read()
    new = re.sub(
        r"EXPECTED: list\[tuple\] = \[.*?\]\n", block, src, count=1, flags=re.S
    )
    assert new != src or "EXPECTED: list[tuple] = [\n    (" in src
    open(PATH, "w").write(new)
    print(f"wrote {len(rows)} frozen rows")


if __name__ == "__main__":
    main()
