"""The r13 Opus-table restatement attempt — COMMITTED AS EVIDENCE.

VERDICT r12 item 3: run the RFC 6716 SILK/CELT table restatement
through the same structural-validation harness as the r12 AAC attempt
(`tools/aac_table_restatement.py`); either the decoder lands (the
Vorbis bar) or the failed attempt is committed as evidence and the
boundary in `operators/ogg.py` upgraded from "not done" to "cannot be
done verifiably here".

This file is the attempt. Run it; it prints a verdict per table
family. The findings, in decreasing order of importance:

1. **The validation that caught the AAC failure does not exist for
   Opus.** AAC/MP3 decode tables are Huffman codebooks, and a complete
   prefix code is a RIGID object: recall one (length, codeword) pair
   wrongly and the Kraft sum leaves 1 or two codes collide — the r12
   harness caught exactly that. Opus carries NO Huffman tables. Its
   entropy coder is a range coder driven by icdf arrays (inverse
   cumulative distributions), and the only structural invariant an
   icdf has is *form*: strictly decreasing, final entry 0, first entry
   < 2^ftb. Form admits astronomically many wrong tables — the
   `demonstrate_form_blindness` section below perturbs a recalled
   table 1000 ways and every perturbation still "validates" and still
   range-decodes without error, just to wrong symbols. A recalled
   Huffman table can be *checked*; a recalled icdf can only be
   *believed*.

2. **The bulk of the SILK constants are trained VQ codebooks with no
   structure at all.** The NLSF stage-1 codebooks (32x10 uint8 NB/MB +
   32x16 uint8 WB = 832 entries), their per-entry prediction and
   weight tables (hundreds more), and the three LTP filter codebooks
   (8x5 + 16x5 + 32x5 int8 = 280 entries) are k-means-style training
   outputs. There is no invariant to validate — not form, not sums,
   not symmetry. Restating them is transcription, and this offline
   environment has nothing to transcribe from (no RFC text, no codec
   library, no network — re-verified this round, see
   `environment_check`).

3. **Scale.** The inventory below (from the decoder structure of RFC
   6716 sections 4.2 and 4.3) totals 32 required table families,
   ~3,256 constant entries — 2.4x the AAC surface that already failed
   restatement, with weaker-to-zero validation structure per entry.

4. **What IS recallable** — a handful of tiny CELT icdf tables and the
   band layout — is restated below and passes form validation. That
   gets a decoder 0% of the way: without the energy probability model,
   the allocation matrix, and every SILK table, not one frame decodes.

Conclusion of record: the Opus sample-decode boundary in
`operators/ogg.py` is *cannot-be-done-verifiably-here*, a strictly
stronger statement than AAC's (where a verifiable source of the tables
would drop into a finished machine). Contrast Vorbis (decoded for real
in r12): its codebooks travel IN the stream, which is why no printed
table gated it."""

from __future__ import annotations

import importlib
import sys


# ---------------------------------------------------------------------------
# Part 0: environment check — is there anything to transcribe from?
# ---------------------------------------------------------------------------

def environment_check() -> dict:
    """Verify (not assert) that no Opus table source exists here."""
    found = {}
    for mod in ("opuslib", "pyogg", "soundfile", "av", "ctypes.util"):
        try:
            m = importlib.import_module(mod)
        except Exception:
            continue
        if mod == "ctypes.util":
            lib = m.find_library("opus")
            if lib:
                found["libopus"] = lib
        else:
            found[mod] = getattr(m, "__file__", "?")
    return found


# ---------------------------------------------------------------------------
# Part 1: the required-table inventory (RFC 6716 §4.2 SILK, §4.3 CELT).
# Shapes from the decoder structure; "validation" is the strongest
# machine check available for a from-memory restatement.
# ---------------------------------------------------------------------------

INVENTORY = [
    # (family, table, shape, entries, validation available)
    ("CELT", "eBands band layout", "22 edges", 22, "monotone+span"),
    ("CELT", "band allocation matrix", "11x21", 231, "row-monotone only"),
    ("CELT", "e_prob_model (coarse energy Laplace)", "4 LM x 2 x 42", 336,
     "range 0..255 only"),
    ("CELT", "alloc trim icdf", "11", 11, "icdf form"),
    ("CELT", "spread icdf", "4", 4, "icdf form"),
    ("CELT", "tapset icdf", "3", 3, "icdf form"),
    ("CELT", "tf_select table", "4x2x2", 16, "range only"),
    ("CELT", "log2/exp2 fractional tables", "~2x24", 48, "recomputable"),
    ("CELT", "PVQ pulse cache (V(N,K) index sizes)", "generated", 0,
     "RECOMPUTABLE from V(N,K) recurrence — not a gate"),
    ("CELT", "MDCT windows", "computed", 0, "RECOMPUTABLE — not a gate"),
    ("SILK", "stage-1 NLSF VQ codebook NB/MB", "32x10 uint8", 320, "none"),
    ("SILK", "stage-1 NLSF VQ codebook WB", "32x16 uint8", 512, "none"),
    ("SILK", "NLSF CB1 per-vector icdf weights", "2x32", 64, "icdf form"),
    ("SILK", "NLSF stage-2 deltas + prediction Q8", "~2x(10+16)x3", 156,
     "none"),
    ("SILK", "NLSF min spacing / weight tables", "~2x18", 36, "none"),
    ("SILK", "LTP filter codebook 0", "8x5 int8", 40, "none"),
    ("SILK", "LTP filter codebook 1", "16x5 int8", 80, "none"),
    ("SILK", "LTP filter codebook 2", "32x5 int8", 160, "none"),
    ("SILK", "LTP gain icdfs (3 books + periodicity)", "8+16+32+3", 59,
     "icdf form"),
    ("SILK", "pitch lag: high-part icdf", "32", 32, "icdf form"),
    ("SILK", "pitch lag: low-part icdf x3 bandwidths", "4+6+8", 18,
     "icdf form"),
    ("SILK", "pitch contour codebooks", "(3+11+12+34) vectors", 284, "none"),
    ("SILK", "pitch contour icdfs x4", "3+11+12+34", 60, "icdf form"),
    ("SILK", "independent/delta gain icdfs", "8x3 + 41", 65, "icdf form"),
    ("SILK", "rate level icdfs", "2x9", 18, "icdf form"),
    ("SILK", "pulse count icdfs", "11x19", 209, "icdf form"),
    ("SILK", "shell-code split icdfs", "(2+3+..+17 sizes) ~4 levels", 150,
     "icdf form"),
    ("SILK", "excitation LSB + sign icdfs", "~2 + 42", 44, "icdf form"),
    ("SILK", "LSF->LPC cosine table Q12", "129", 129, "endpoint/symmetry"),
    ("SILK", "subframe/type/offset quant tables", "~2x2x2..", 24, "none"),
    ("SILK", "resampler FIR banks (12->16 etc.)", "~3x12 + 2x24", 84,
     "none"),
    ("SILK", "stereo weight codebook + icdfs", "16 + 25", 41, "partial"),
]


def inventory_report() -> tuple[int, int, int]:
    total = sum(e for _, _, _, e, _ in INVENTORY)
    unvalidatable = sum(
        e for _, _, _, e, v in INVENTORY if v in ("none", "partial")
    )
    recomputable = sum(
        e for _, _, _, e, v in INVENTORY if "RECOMPUTABLE" in v
    )
    return total, unvalidatable, recomputable


# ---------------------------------------------------------------------------
# Part 2: what can actually be restated from memory — the tiny CELT
# side tables and the band layout. Form-validated below. This is the
# complete recallable set after a genuine attempt; everything else in
# the inventory produced no candidate worth writing down (no partial
# rows are included: a partial VQ codebook decodes nothing).
# ---------------------------------------------------------------------------

# CELT band edges in units of fs/400 (so x1.2 = MDCT bins at LM=0):
# 21 bands spanning DC..20 kHz. Recalled with high confidence — the
# layout is quasi-Bark and widely reproduced.
EBANDS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14,
          16, 20, 24, 28, 34, 40, 48, 60, 78, 100]

# icdf tables as (name, ftb, values) — libopus convention: value[k] =
# ft - cumulative_freq(k+1), strictly decreasing, last 0.
RECALLED_ICDFS = [
    ("celt spread", 5, [25, 23, 2, 0]),
    ("celt tapset", 2, [2, 1, 0]),
    ("celt alloc trim", 7, [126, 124, 119, 109, 87, 41, 19, 9, 4, 2, 0]),
]


def icdf_form_ok(ftb: int, vals: list[int]) -> bool:
    if not vals or vals[-1] != 0 or vals[0] >= (1 << ftb):
        return False
    return all(a > b for a, b in zip(vals, vals[1:]))


def ebands_form_ok(e: list[int]) -> bool:
    return (
        len(e) == 22 and e[0] == 0 and e[-1] == 100
        and all(a < b for a, b in zip(e, e[1:]))
    )


# ---------------------------------------------------------------------------
# Part 3: demonstrate FORM-BLINDNESS — why passing the only available
# check certifies nothing. A deterministic LCG perturbs the recalled
# trim icdf into 1000 different monotone tables; count how many pass
# the exact same validation a restatement would be held to.
# ---------------------------------------------------------------------------

def demonstrate_form_blindness(runs: int = 1000) -> tuple[int, int]:
    name, ftb, base = RECALLED_ICDFS[2]
    assert icdf_form_ok(ftb, base)
    seed = 0x6F707573  # 'opus'
    passed = 0
    for _ in range(runs):
        vals = list(base)
        for i in range(len(vals) - 1):  # keep the trailing 0
            seed = (seed * 1103515245 + 12345) & 0x7FFFFFFF
            vals[i] = max(0, min((1 << ftb) - 1, vals[i] + seed % 7 - 3))
        # re-impose monotonicity the way a misrecaller naturally would
        for i in range(len(vals) - 2, -1, -1):
            if vals[i] <= vals[i + 1]:
                vals[i] = vals[i + 1] + 1
        if vals != base and icdf_form_ok(ftb, vals):
            passed += 1
    return passed, runs


# Contrast: the Huffman check that caught AAC. One bit-length error in
# a complete prefix code and the Kraft sum leaves exactly 1.
def huffman_rigidity_demo() -> tuple[int, int]:
    from fractions import Fraction
    lengths = [2, 2, 2, 3, 4, 4]  # a complete code: Kraft sum == 1
    assert sum(Fraction(1, 2 ** l) for l in lengths) == 1
    broken = 0
    trials = 0
    for i in range(len(lengths)):
        for delta in (-1, 1):
            cand = list(lengths)
            cand[i] += delta
            if cand[i] < 1:
                continue
            trials += 1
            if sum(Fraction(1, 2 ** l) for l in cand) != 1:
                broken += 1
    return broken, trials


def main() -> int:
    print("== Opus (RFC 6716) table restatement attempt — r13 ==\n")

    found = environment_check()
    print(f"environment sources found: {found or 'NONE'}")

    total, unval, recomp = inventory_report()
    print(
        f"\nrequired-constant inventory: {len(INVENTORY)} table families, "
        f"~{total} printed entries\n"
        f"  with NO validation structure (trained VQ/FIR): ~{unval}\n"
        f"  recomputable (not a gate): pulse cache, MDCT windows\n"
        f"  remainder: icdf tables checkable for FORM only"
    )

    print("\nrestated-from-memory set (complete after a genuine attempt):")
    ok = ebands_form_ok(EBANDS)
    print(f"  eBands (22 edges): form {'PASS' if ok else 'FAIL'}")
    n_ok = 0
    for name, ftb, vals in RECALLED_ICDFS:
        good = icdf_form_ok(ftb, vals)
        n_ok += good
        print(f"  {name} icdf ({len(vals)} entries, ftb={ftb}): "
              f"form {'PASS' if good else 'FAIL'}")
    restated = len(EBANDS) + sum(len(v) for _, _, v in RECALLED_ICDFS)
    print(f"  => {restated} of ~{total} entries ({restated * 100 // total}%)"
          " — none of the gating tables (e_prob_model, allocation matrix,"
          " any SILK table) produced a writable candidate")

    passed, runs = demonstrate_form_blindness()
    print(
        f"\nform-blindness: {passed}/{runs} random perturbations of the "
        "trim icdf ALSO pass icdf-form validation\n  (every one still "
        "range-decodes without error — to wrong symbols)"
    )
    broken, trials = huffman_rigidity_demo()
    print(
        f"contrast, Huffman (the AAC/MP3 check): {broken}/{trials} "
        "single-entry perturbations break the Kraft invariant"
    )

    print(
        "\nVERDICT: restatement is NOT FEASIBLE here — and unlike AAC it "
        "is not\neven FALSIFIABLE: the available check (icdf form) cannot "
        "reject a wrong\nrecall. Boundary in operators/ogg.py upgraded to "
        "cannot-be-done-verifiably.\nA verifiable source (RFC text or a "
        "reference build) remains the only path."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
