"""Typed fast-field value codecs: ip and bytes.

The reference maps these field types onto its columnar fast fields:

- ``ip`` — IpAddr parsed from text, stored as an IPv6 u128 (IPv4 mapped
  into ``::ffff:a.b.c.d`` space) so one numeric ordering covers both
  families (quickwit-doc-mapper/src/default_doc_mapper/
  field_mapping_type.rs:42, tantivy-common u128 fast field [public]).
- ``bytes`` — base64 text in JSON, raw bytes in the column
  (field_mapping_type.rs:44).

Here the sortable transport for ``ip`` is the 32-lowercase-hex-digit
form of that u128: fixed width, so LEXICOGRAPHIC string order equals
numeric u128 order. That makes the normalized column directly usable by
every existing engine path — numpy comparisons for Range, equality for
Term, the 2-field sort spec, and per-segment min/max pruning stats all
work on plain string columns with zero new query-side machinery.

Vectorization: dotted-quad IPv4 (the overwhelmingly common case) is
normalized with pandas str ops only — no per-row Python. Anything that
doesn't match the strict IPv4 shape falls back to the stdlib
``ipaddress`` parser per distinct value (IPv6 literals are rare and the
fallback parses each DISTINCT value once, not each row).
"""

from __future__ import annotations

import base64
import ipaddress

import numpy as np
import pandas as pd

__all__ = [
    "ip_to_hex", "ip_norm_one", "hex_to_ip_display", "bytes_from_b64",
    "FIELD_TYPES",
]

FIELD_TYPES = ("ip", "bytes")

_OCT = r"(0|[1-9]\d{0,2})"  # no leading zeros (ipaddress rejects them)
_IPV4_RE = rf"^{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}$"
# IPv4 maps into the IPv6 ::ffff:0:0/96 block (RFC 4291 §2.5.5.2): the
# u128 is 0x0000...0000ffff << 32 | v4_u32.
_V4_PREFIX = "00000000000000000000ffff"


def ip_to_hex(values) -> pd.Series:
    """Normalize a series of IP-address strings to the 32-hex-char
    sortable form of their IPv6 u128. Nulls stay null; unparsable
    values raise ValueError (the reference rejects bad IPs at doc
    parse time, doc_processor malformed counters)."""
    s = pd.Series(values, dtype=object).astype("string")
    out = pd.Series(np.full(len(s), None, dtype=object), index=s.index)
    null = s.isna()
    parts = s.str.extract(_IPV4_RE)
    is_v4 = parts[0].notna()
    if is_v4.any():
        octs = [pd.to_numeric(parts[i][is_v4]).to_numpy(np.int64)
                for i in range(4)]
        if any((o > 255).any() for o in octs):
            bad = ((octs[0] > 255) | (octs[1] > 255)
                   | (octs[2] > 255) | (octs[3] > 255))
            raise ValueError(
                f"invalid IPv4 literal(s): "
                f"{s[is_v4][bad].head(3).tolist()}")
        u32 = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
        hexed = pd.Series(u32).map("{:08x}".format).to_numpy(object)
        out.loc[is_v4] = _V4_PREFIX + hexed
    rest = ~is_v4 & ~null
    if rest.any():
        # per DISTINCT value, not per row
        lut = {v: ip_norm_one(v) for v in s[rest].unique()}
        out.loc[rest] = s[rest].map(lut)
    return out


def ip_norm_one(value: str) -> str:
    """One query-side IP literal -> 32-hex sortable form."""
    try:
        ip = ipaddress.ip_address(str(value).strip())
    except ValueError:
        raise ValueError(
            f"cannot interpret {value!r} as an IP address") from None
    if isinstance(ip, ipaddress.IPv4Address):
        ip = ipaddress.IPv6Address(f"::ffff:{ip}")
    return f"{int(ip):032x}"


def hex_to_ip_display(hex_form: str) -> str:
    """Canonical text form for output (the reference serializes
    IpAddr back to text on fetch): v4-mapped values render as the
    dotted quad, others as compressed IPv6."""
    ip = ipaddress.IPv6Address(int(hex_form, 16))
    v4 = ip.ipv4_mapped
    return str(v4) if v4 is not None else str(ip)


def bytes_from_b64(values) -> list:
    """base64 text column -> raw bytes values (JSON transport of the
    reference's bytes fields, field_mapping_type.rs:44). Already-bytes
    values pass through; nulls stay null."""
    out = []
    for v in values:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            out.append(None)
        elif isinstance(v, (bytes, bytearray)):
            out.append(bytes(v))
        else:
            try:
                out.append(base64.b64decode(str(v), validate=True))
            except Exception:
                raise ValueError(
                    f"cannot interpret {v!r} as base64 bytes") from None
    return out
