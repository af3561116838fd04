#!/usr/bin/env python
"""Hand-assemble the frozen BLOW5/SLOW5 byte fixture.

Every byte below is written out longhand from the SLOW5 format constants —
deliberately WITHOUT importing sigmap_tpu.io.slow5 — so the fixture is an
independent anchor for the codec under test (tests/test_io.py).  The svb-zd
signal payload is hand-computed in the comments.

Record: read_id "r001", digitisation 8192, offset 10, range 1500,
sampling_rate 4000, raw int16 signal [10, 12, 9, 9, 500].

svb-zd of the signal, by hand:
  deltas  (prepend 0):  10,  2, -3, 0, 491
  zigzag  (2d ^ d>>63): 20,  4,  5, 0, 982
  byte lengths:          1,  1,  1, 1,   2   -> codes 0,0,0,0,1
  control bytes (2-bit codes, value j at bit 2*(j%4)): 0x00, 0x01
  data: 0x14 0x04 0x05 0x00 0xD6 0x03   (982 = 0x03D6 little-endian)
"""
import struct
import sys

MAGIC = b"BLOW5\x01"
EOF = b"5WOLB"
META = (
    b"#read_id\tread_group\tdigitisation\toffset\trange\tsampling_rate\t"
    b"len_raw_signal\traw_signal\n"
)

SIG_SVB_ZD = bytes([0x00, 0x01, 0x14, 0x04, 0x05, 0x00, 0xD6, 0x03])

# 68-byte fixed header: magic(6) version(3: 1.0.0) rec_comp(1: none)
# sig_comp(1: svb-zd) n_read_groups(4: 1) zero padding to 68
header = bytearray(68)
header[0:6] = MAGIC
header[6:9] = bytes([1, 0, 0])
header[9] = 0          # record compression: none
header[10] = 1         # signal compression: svb-zd
header[11:15] = struct.pack("<I", 1)

rid = b"r001"
body = (
    struct.pack("<H", len(rid)) + rid
    + struct.pack("<IddddQ", 0, 8192.0, 10.0, 1500.0, 4000.0, 5)
    + struct.pack("<Q", len(SIG_SVB_ZD)) + SIG_SVB_ZD
)

blow5 = (
    bytes(header)
    + struct.pack("<I", len(META)) + META
    + struct.pack("<I", len(body)) + body
    + EOF
)

slow5 = (
    "#slow5_version\t1.0.0\n#num_read_groups\t1\n"
    "#read_id\tread_group\tdigitisation\toffset\trange\tsampling_rate\t"
    "len_raw_signal\traw_signal\n"
    "r001\t0\t8192.0\t10.0\t1500.0\t4000.0\t5\t10,12,9,9,500\n"
)

if __name__ == "__main__":
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "minimal.blow5"), "wb") as f:
        f.write(blow5)
    with open(os.path.join(here, "minimal.slow5"), "w") as f:
        f.write(slow5)
    print(f"wrote minimal.blow5 ({len(blow5)} bytes) + minimal.slow5",
          file=sys.stderr)
