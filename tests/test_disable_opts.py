"""-nu / -nt disable-optimization flags (DisabledOptimizations,
AlignerOptions.h:78-88): the A/B debugging mode SURVEY's hard-parts
list calls for. With them off, the wavefront must score every rep
(no Ukkonen limit) at full seed depth (no adaptive early stop) — and
on non-repetitive data the results must be unchanged, because the
optimizations only skip work that cannot alter the outcome there.
"""

import numpy as np


def test_nu_nt_flags_run_and_match_defaults(tmp_path):
    from snap_tpu.cli import main

    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=30000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{seq}\n")
    idx = tmp_path / "idx"
    assert main(["index", str(fa), str(idx), "-s", "20"]) == 0

    reads = []
    for i in range(48):
        p = int(rng.integers(0, 29800))
        r = list(seq[p : p + 100])
        for _ in range(2):
            j = int(rng.integers(0, 100))
            r[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"r{i}", "".join(r)))
    fq = tmp_path / "r.fq"
    fq.write_text(
        "".join(f"@{n}\n{r}\n+\n{'I' * len(r)}\n" for n, r in reads)
    )

    o1, o2 = tmp_path / "a.sam", tmp_path / "b.sam"
    assert main(["single", str(idx), str(fq), "-o", str(o1)]) == 0
    assert main(
        ["single", str(idx), str(fq), "-o", str(o2), "-nu", "-nt"]
    ) == 0

    def body(p):
        return [
            l for l in p.read_bytes().split(b"\n")
            if not l.startswith(b"@PG")
        ]

    assert body(o1) == body(o2)
