"""FASTA random-access source: indexed substring extraction per record.

Reference analogue: ``pyfaidx.Fasta`` slicing for variant flanking
sequence (``/root/reference/src/etl/helpers/assembly_sequence_helper.py:37-73``,
``/root/reference/src/etl/variation_etl.py:298-327`` — SURVEY S11/T2/M11).

``pyfaidx`` is not in this container, so ``FastaStore`` is a small pure-
Python indexed reader (builds a per-sequence offset index once, then
serves O(1) slices from the in-memory sequence).  The Ray-side shape is
the important part: ``SequenceSlice`` is an ACTOR-POOL ``map_batches``
stage — the store loads once per actor in ``__init__`` (never per
batch), per-row slices are served from shared read-only state::

    ds.map_batches(SequenceSlice, fn_constructor_args=(fasta_path,),
                   batch_format="pyarrow", concurrency=(1, 4))

with input columns (chrom, start, end) → output column ``seq`` plus
±``flank`` context columns, mirroring the reference's variant padding.
"""

from __future__ import annotations

import pyarrow as pa


class FastaStore:
    """Tiny indexed FASTA reader (stand-in for pyfaidx; same contract)."""

    def __init__(self, path: str):
        self.sequences: dict[str, str] = {}
        name, chunks = None, []
        with open(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        self.sequences[name] = "".join(chunks)
                    name = line[1:].split()[0]
                    chunks = []
                elif name is not None:
                    chunks.append(line.strip())
        if name is not None:
            self.sequences[name] = "".join(chunks)

    def slice(self, chrom: str, start: int, end: int) -> str:
        """1-based inclusive slice (reference convention), clamped."""
        seq = self.sequences.get(chrom, "")
        return seq[max(0, start - 1): min(len(seq), end)]


_COMPLEMENT = str.maketrans("ACGTacgt", "TGCAtgca")


def reverse_complement(seq: str) -> str:
    """(SURVEY §2.8: Biopython reverse-complement analogue,
    ``/root/reference/src/etl/protein_sequence_etl.py:79-104``)."""
    return seq.translate(_COMPLEMENT)[::-1]


class SequenceSlice:
    """Actor-pool stage: (chrom, start, end[, strand]) rows → seq + flanks."""

    def __init__(self, fasta_path: str, flank: int = 500):
        self.store = FastaStore(fasta_path)  # once per actor
        self.flank = flank

    def __call__(self, batch: pa.Table) -> pa.Table:
        chroms = batch["chrom"].to_pylist()
        starts = batch["start"].to_pylist()
        ends = batch["end"].to_pylist()
        strands = (
            batch["strand"].to_pylist() if "strand" in batch.column_names
            else ["+"] * batch.num_rows
        )
        seqs, ups, downs = [], [], []
        for c, s, e, st in zip(chroms, starts, ends, strands):
            seq = self.store.slice(c, s, e)
            up = self.store.slice(c, s - self.flank, s - 1)
            down = self.store.slice(c, e + 1, e + self.flank)
            if st == "-":
                seq, up, down = reverse_complement(seq), reverse_complement(down), reverse_complement(up)
            seqs.append(seq)
            ups.append(up)
            downs.append(down)
        out = {name: batch[name] for name in batch.column_names}
        out["seq"] = pa.array(seqs, pa.string())
        out["upstream"] = pa.array(ups, pa.string())
        out["downstream"] = pa.array(downs, pa.string())
        return pa.table(out)
