"""SAM output (reference: write_sam / write_sam_streaming,
src/utils/utils.cpp:336-503).

Per (query, candidate j<k) line: QNAME = fastq id, FLAG = (0 primary / 256
secondary) | 16 when the candidate id is odd (reverse strand), POS =
seq_id // 2 + 1 (1-based), MAPQ = 60 pseudo, CIGAR = "<len>M" pseudo, SEQ =
query with '<'/'>' wrapping stripped, QUAL = '*'.
"""

from __future__ import annotations

from typing import Iterable

PREFIX_LEN = 1
POSTFIX_LEN = 1


def _clean_query(q: str) -> str:
    if len(q) > PREFIX_LEN + POSTFIX_LEN:
        return q[PREFIX_LEN : len(q) - POSTFIX_LEN]
    return q


def sam_header(ref_name: str, ref_len: int) -> str:
    return f"@HD\tVN:1.0\tSO:unsorted\n@SQ\tSN:{ref_name}\tLN:{ref_len}\n"


def format_sam_records(
    query_seqs: list[str],
    query_ids: list[str],
    cand_ids: Iterable[int],
    k: int,
    ref_name: str,
    query_offset: int = 0,
) -> Iterable[str]:
    """Yield SAM lines for queries [query_offset, query_offset+len(query_seqs))
    whose flattened candidate ids are ``cand_ids`` ([nq * k], row-major)."""
    cand_ids = list(cand_ids)
    for i, qseq in enumerate(query_seqs):
        clean = _clean_query(qseq)
        gq = query_offset + i
        qname = (
            query_ids[gq]
            if gq < len(query_ids) and query_ids[gq]
            else f"S1/{gq + 1}/0"
        )
        cigar = f"{len(clean)}M"
        for j in range(k):
            idx = i * k + j
            if idx >= len(cand_ids):
                break
            seq_id = int(cand_ids[idx])
            pos = seq_id // 2 + 1
            flag = (0 if j == 0 else 256) | (16 if seq_id % 2 == 1 else 0)
            yield (
                f"{qname}\t{flag}\t{ref_name}\t{pos}\t60\t{cigar}\t*\t0\t0\t"
                f"{clean}\t*\n"
            )


def write_sam(
    query_seqs: list[str],
    query_ids: list[str],
    cand_ids: Iterable[int],
    ref_name: str,
    ref_len: int,
    k: int,
    output_file: str,
    append: bool = False,
    write_header: bool = True,
    query_offset: int = 0,
) -> None:
    mode = "a" if append else "w"
    with open(output_file, mode) as f:
        if write_header:
            f.write(sam_header(ref_name, ref_len))
        for line in format_sam_records(
            query_seqs, query_ids, cand_ids, k, ref_name, query_offset
        ):
            f.write(line)
