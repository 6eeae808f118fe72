"""BAM output (io/bam.py): encoder validated by an independent decoder.

The decoder here shares no code with the encoder: BGZF framing is
validated by (a) checking every member's BSIZE extra subfield walks the
file exactly and (b) letting gzip.decompress handle the member
concatenation; records are then re-parsed from the binary layout and
compared field-by-field against the source SAM."""

import gzip
import os
import struct

import numpy as np
import pytest

from deepreadmapper_tpu.io.bam import sam_to_bam

_OPS = "MIDNSHP=X"
_NIB = "=ACMGRSVTWYHKDBN"


def _walk_bgzf(path):
    """Independently walk BGZF members via their BSIZE fields."""
    data = open(path, "rb").read()
    off = 0
    n = 0
    while off < len(data):
        assert data[off:off + 4] == b"\x1f\x8b\x08\x04", f"member @{off}"
        xlen = struct.unpack_from("<H", data, off + 10)[0]
        extra = data[off + 12: off + 12 + xlen]
        assert extra[:4] == b"BC\x02\x00"
        bsize = struct.unpack_from("<H", extra, 4)[0] + 1
        off += bsize
        n += 1
    assert off == len(data)
    return n


def _decode_bam(path):
    raw = gzip.decompress(open(path, "rb").read())
    assert raw[:4] == b"BAM\x01"
    (l_text,) = struct.unpack_from("<i", raw, 4)
    off = 8 + l_text
    header_text = raw[8: 8 + l_text].decode()
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    refs = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, off)
        off += 4
        name = raw[off: off + l_name - 1].decode()
        off += l_name
        (l_ref,) = struct.unpack_from("<i", raw, off)
        off += 4
        refs.append((name, l_ref))
    records = []
    while off < len(raw):
        (block_size,) = struct.unpack_from("<i", raw, off)
        off += 4
        end = off + block_size
        (ref_id, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, next_ref,
         next_pos, tlen) = struct.unpack_from("<iiBBHHHiiii", raw, off)
        p = off + 32
        qname = raw[p: p + l_rn - 1].decode()
        p += l_rn
        cig = []
        for _ in range(n_cig):
            (v,) = struct.unpack_from("<I", raw, p)
            cig.append(f"{v >> 4}{_OPS[v & 0xF]}")
            p += 4
        seq = ""
        for i in range(l_seq):
            b = raw[p + i // 2]
            seq += _NIB[(b >> 4) if i % 2 == 0 else (b & 0xF)]
        p += (l_seq + 1) // 2
        qual = raw[p: p + l_seq]
        p += l_seq
        tags = {}
        while p < end:
            tg = raw[p: p + 2].decode()
            tp = chr(raw[p + 2])
            assert tp == "Z"
            z = raw.index(b"\x00", p + 3)
            tags[tg] = raw[p + 3: z].decode()
            p = z + 1
        records.append(dict(
            qname=qname, flag=flag, ref_id=ref_id, pos=pos, mapq=mapq,
            cigar="".join(cig) or "*", next_ref=next_ref,
            next_pos=next_pos, tlen=tlen, seq=seq,
            qual=qual, tags=tags,
        ))
        off = end
    return header_text, refs, records


@pytest.fixture(scope="module")
def sam_and_bam(tmp_path_factory, data_dir):
    from deepreadmapper_tpu.pipeline.build import build_index
    from deepreadmapper_tpu.pipeline.search import run_pipeline

    d = tmp_path_factory.mktemp("bam")
    prefix = str(d / "idx")
    build_index(
        str(data_dir / "ecoli_150.fna"), prefix, 150, index_type="INT8FLAT"
    )
    out = str(d / "out")
    run_pipeline(
        prefix, str(data_dir / "test_data.fastq"),
        str(data_dir / "ecoli_150.fna"), k=4, output_dir=out,
        mapq=True, qual=True, sort=True, bam=True,
    )
    return os.path.join(out, "results.sam"), os.path.join(out, "results.bam")


def test_bgzf_framing(sam_and_bam):
    _sam, bam = sam_and_bam
    n_members = _walk_bgzf(bam)
    assert n_members >= 2  # at least one data block + the EOF block
    # last 28 bytes are the canonical BGZF EOF marker
    assert open(bam, "rb").read()[-28:] == bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    )


def test_bam_records_match_sam(sam_and_bam):
    sam, bam = sam_and_bam
    header, refs, records = _decode_bam(bam)
    sam_lines = [l.rstrip("\n").split("\t") for l in open(sam)
                 if not l.startswith("@")]
    assert "SO:coordinate" in header
    assert refs == [("ref", 150)]
    assert len(records) == len(sam_lines)
    for r, f in zip(records, sam_lines):
        assert r["qname"] == f[0]
        assert r["flag"] == int(f[1])
        assert r["ref_id"] == (0 if f[2] == "ref" else -1)
        assert r["pos"] == int(f[3]) - 1
        assert r["mapq"] == int(f[4])
        assert r["cigar"] == f[5]
        assert r["seq"] == f[9].upper()
        assert bytes(q + 33 for q in r["qual"]).decode() == f[10]
    # sorted order survives into BAM
    pos = [r["pos"] for r in records]
    assert pos == sorted(pos)


def test_bai_index(sam_and_bam):
    """--sort --bam writes a BAI; validate structure + that every record's
    voffset is reachable: its bin's chunks cover it and the linear index
    entry for its 16 kb interval points at or before it."""
    from deepreadmapper_tpu.io.bam import reg2bin

    _sam, bam = sam_and_bam
    bai = bam + ".bai"
    assert os.path.exists(bai)
    raw = open(bai, "rb").read()
    assert raw[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", raw, 4)
    assert n_ref == 1
    off = 8
    (n_bin,) = struct.unpack_from("<i", raw, off)
    off += 4
    bins = {}
    for _ in range(n_bin):
        b, n_chunk = struct.unpack_from("<Ii", raw, off)
        off += 8
        chunks = []
        for _ in range(n_chunk):
            beg, end = struct.unpack_from("<QQ", raw, off)
            off += 16
            assert beg < end
            chunks.append((beg, end))
        bins[b] = chunks
    (n_intv,) = struct.unpack_from("<i", raw, off)
    off += 4
    linear = list(struct.unpack_from(f"<{n_intv}Q", raw, off))
    assert off + 8 * n_intv == len(raw)

    # decode the BAM with record voffsets via the BSIZE walk
    data = open(bam, "rb").read()
    blocks = []  # (compressed_offset, uncompressed_start)
    coff = uoff = 0
    while coff < len(data):
        xlen = struct.unpack_from("<H", data, coff + 10)[0]
        bsize = struct.unpack_from("<H", data, coff + 16)[0] + 1
        isize = struct.unpack_from("<I", data, coff + bsize - 4)[0]
        blocks.append((coff, uoff))
        coff += bsize
        uoff += isize
    import bisect
    import gzip

    raw_all = gzip.decompress(data)

    def voffset_of(upos):
        i = bisect.bisect_right([u for _c, u in blocks], upos) - 1
        c, u = blocks[i]
        return (c << 16) | (upos - u)

    (l_text,) = struct.unpack_from("<i", raw_all, 4)
    p = 8 + l_text
    (nr,) = struct.unpack_from("<i", raw_all, p)
    p += 4
    for _ in range(nr):
        (ln,) = struct.unpack_from("<i", raw_all, p)
        p += 4 + ln + 4
    checked = 0
    while p < len(raw_all):
        v = voffset_of(p)
        (bs,) = struct.unpack_from("<i", raw_all, p)
        ref_id, pos, _lrn, _mq, bin_, ncig = struct.unpack_from(
            "<iiBBHH", raw_all, p + 4
        )
        if ref_id >= 0:
            assert any(beg <= v < end for beg, end in bins[bin_]), (v, bin_)
            assert linear[pos >> 14] <= v
            checked += 1
        p += 4 + bs
    assert checked > 100


def test_bai_multibin_synthetic(tmp_path):
    """Multi-bin / multi-interval BAI paths: records spread over 5 Mbp
    with 35 kb reference spans (crossing 16 kb linear intervals and
    multiple reg2bin levels) plus gaps that exercise the empty-interval
    fill.  Every record voffset must be reachable through its bin and
    its linear-index entries."""
    from deepreadmapper_tpu.io.bam import reg2bin, sam_to_bam

    sam = str(tmp_path / "wide.sam")
    rng = np.random.default_rng(5)
    poss = np.sort(rng.integers(1, 5_000_000, 300))
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.0\tSO:coordinate\n@SQ\tSN:chr1\tLN:6000000\n")
        for i, p in enumerate(poss):
            # 500M pseudo + occasional 35 kb N-span (spliced-style)
            cig = "500M" if i % 5 else "100M34900N400M"
            f.write(f"r{i}\t0\tchr1\t{p}\t60\t{cig}\t*\t0\t0\t"
                    f"{'A' * 500}\t*\n")
    bam = str(tmp_path / "wide.bam")
    n = sam_to_bam(sam, bam, bai_path=bam + ".bai")
    assert n == 300
    raw = open(bam + ".bai", "rb").read()
    (n_ref,) = struct.unpack_from("<i", raw, 4)
    assert n_ref == 1
    off = 8
    (n_bin,) = struct.unpack_from("<i", raw, off)
    off += 4
    bins = {}
    for _ in range(n_bin):
        b, n_chunk = struct.unpack_from("<Ii", raw, off)
        off += 8
        bins[b] = [struct.unpack_from("<QQ", raw, off + 16 * j)
                   for j in range(n_chunk)]
        off += 16 * n_chunk
    (n_intv,) = struct.unpack_from("<i", raw, off)
    off += 4
    linear = list(struct.unpack_from(f"<{n_intv}Q", raw, off))
    assert len(bins) > 3  # multiple bins actually used
    assert n_intv > 100   # many 16 kb intervals, most filled by inheritance
    assert all(linear[i] <= linear[i + 1] or linear[i + 1] >= linear[0]
               for i in range(n_intv - 1))
    # decode records and verify reachability
    header, _refs, records = _decode_bam(bam)
    data = open(bam, "rb").read()
    blocks, coff, uoff = [], 0, 0
    while coff < len(data):
        bsize = struct.unpack_from("<H", data, coff + 16)[0] + 1
        isize = struct.unpack_from("<I", data, coff + bsize - 4)[0]
        blocks.append((coff, uoff))
        coff += bsize
        uoff += isize
    import bisect
    import gzip
    raw_all = gzip.decompress(data)
    (l_text,) = struct.unpack_from("<i", raw_all, 4)
    p = 8 + l_text
    (nr,) = struct.unpack_from("<i", raw_all, p)
    p += 4
    for _ in range(nr):
        (ln,) = struct.unpack_from("<i", raw_all, p)
        p += 4 + ln + 4
    i = 0
    while p < len(raw_all):
        v = ((blocks[bisect.bisect_right([u for _c, u in blocks], p) - 1][0])
             << 16) | (p - blocks[
                 bisect.bisect_right([u for _c, u in blocks], p) - 1][1])
        (bs,) = struct.unpack_from("<i", raw_all, p)
        _rid, pos, _lrn, _mq, bin_, _nc = struct.unpack_from(
            "<iiBBHH", raw_all, p + 4)
        assert any(beg <= v < end for beg, end in bins[bin_]), (i, bin_)
        assert linear[pos >> 14] <= v
        p += 4 + bs
        i += 1
    assert i == 300


def test_bam_sa_tags_roundtrip(tmp_path, data_dir):
    """Split-read SA:Z tags pass through to BAM tags."""
    from deepreadmapper_tpu.io.sam import sam_header, write_sam

    sam = str(tmp_path / "x.sam")
    write_sam(
        ["<" + "A" * 30 + ">"], ["q1"], [10, 13], "ref", 150, 2, sam,
        supplementary={0: [(40, "10S20M", 33)]},
    )
    bam = str(tmp_path / "x.bam")
    n = sam_to_bam(sam, bam)
    assert n == 3  # primary + secondary + supplementary
    _h, _refs, records = _decode_bam(bam)
    assert "SA" in records[0]["tags"]  # primary cross-references the supp
    assert records[2]["flag"] & 0x800
    assert records[2]["cigar"] == "10S20M"
    assert "SA" in records[2]["tags"]
