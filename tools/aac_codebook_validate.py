"""Validate (and optionally emit a template for) an AAC codebook file
for the $SPARK_GRAFT_AAC_CODEBOOKS injection seam.

The engine's AAC-LC machinery is complete; only the ISO 13818-7
spectral Huffman tables (A.2-A.12) are absent (see
tools/aac_table_restatement.py for the committed evidence of why).
A user holding the ISO tables writes them to a JSON or CSV file:

  JSON: {"books": {"1": {"lens": [11, 9, ...], "codes": ["0x7f8", ...]},
          ..., "11": {...}, "sf": {...}}}
  CSV:  book,index,len,code   (index in the spec's flattened tuple
         order: base-(2*LAV+1) digits x+LAV for signed books,
         base-(LAV+1) for unsigned; code decimal or 0x-hex)

then validates it here and exports SPARK_GRAFT_AAC_CODEBOOKS=<file> —
every decode path (decode_aac_samples, the media sweep, ADTS/MP4
routing) picks the tables up without code changes.

Usage:
  python tools/aac_codebook_validate.py <codebooks.json|.csv>
  python tools/aac_codebook_validate.py --template <out.json>
      # writes the engine's canonical (non-ISO, structurally valid)
      # book set as a schema example a table-holder can overwrite

Exit 0 = the file loads and every book passes the complete-prefix-tree
validation (alphabet sizes, codeword widths, pairwise prefix-free,
Kraft sum exactly 1). Exit 1 = the precise failure is printed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sample_dms_kinesis_rds_mariadb_spark.operators.aac import (  # noqa: E402
    CODEBOOKS_ENV,
    canonical_codebooks,
    dump_codebooks,
    load_codebooks,
)


def main(argv: list[str]) -> int:
    if len(argv) == 3 and argv[1] == "--template":
        dump_codebooks(canonical_codebooks(), argv[2])
        print(
            f"wrote the canonical (non-ISO) book set to {argv[2]} as a "
            "schema template — overwrite lens/codes with the ISO values"
        )
        return 0
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    try:
        books = load_codebooks(argv[1])
    except (ValueError, KeyError, OSError) as exc:
        print(f"INVALID: {exc}")
        return 1
    for bid in list(range(1, 12)) + ["sf"]:
        b = books[bid]
        print(
            f"book {bid}: {len(b.lens)} codewords, max length "
            f"{b.maxlen()} — complete prefix tree OK"
        )
    print(
        f"VALID — export {CODEBOOKS_ENV}={argv[1]} to enable "
        "real-stream AAC-LC decode"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
