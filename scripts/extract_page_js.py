"""Extract the in-page <script> from web/page.py to stdout.

Used by the CI frontend job to run ``node --check`` on the real script
(the analog of the reference's webpack production build gate,
``/root/reference/.github/workflows/linux.yml:79-92``). Loads page.py by
path — it is import-free — so no Python dependencies are needed.
"""

import re
import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ns = runpy.run_path(str(REPO / "cartpole_tpu" / "web" / "page.py"))
    # Non-greedy per-block match: a second <script> block must come out as
    # its own block, never as script+HTML+script under one greedy span.
    blocks = re.findall(r"<script>(.*?)</script>", ns["PAGE_HTML"], re.DOTALL)
    if not blocks:
        print("no <script> block found in PAGE_HTML", file=sys.stderr)
        return 1
    sys.stdout.write("\n;\n".join(blocks))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
