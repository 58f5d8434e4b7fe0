"""TensorBoard event-file writer: verify the TFRecord framing (masked
CRC32C) and proto wire format by parsing the file back by hand."""

import struct

import numpy as np


def _read_records(path):
    data = open(path, "rb").read()
    from neuradar_tpu.utils.tb_writer import _masked_crc

    pos, records = 0, []
    while pos < len(data):
        header = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (crc_h,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        assert crc_h == _masked_crc(header), "length crc mismatch"
        payload = data[pos + 12 : pos + 12 + length]
        (crc_d,) = struct.unpack("<I", data[pos + 12 + length : pos + 16 + length])
        assert crc_d == _masked_crc(payload), "data crc mismatch"
        records.append(payload)
        pos += 16 + length
    return records


def _parse_fields(buf):
    """Minimal proto parser -> {field: [values]} (bytes for ld, raw ints/floats)."""
    out = {}
    pos = 0

    def varint():
        nonlocal pos
        shift = val = 0
        while True:
            b = buf[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    while pos < len(buf):
        key = varint()
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = varint()
        elif wire == 1:
            v = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif wire == 5:
            v = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif wire == 2:
            n = varint()
            v = buf[pos : pos + n]
            pos += n
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def test_tb_scalars_and_images_roundtrip(tmp_path):
    from neuradar_tpu.utils.tb_writer import TBEventWriter

    w = TBEventWriter(tmp_path)
    w.add_scalar("loss", 0.125, step=7)
    w.add_image("render", np.zeros((4, 6, 3), np.uint8), step=8)
    w.close()

    records = _read_records(w.path)
    assert len(records) == 3
    # header: file_version
    header = _parse_fields(records[0])
    assert header[3] == [b"brain.Event:2"]
    # scalar event
    ev = _parse_fields(records[1])
    assert ev[2] == [7]  # step
    value = _parse_fields(_parse_fields(ev[5][0])[1][0])
    assert value[1] == [b"loss"]
    assert abs(value[2][0] - 0.125) < 1e-9
    # image event
    ev = _parse_fields(records[2])
    assert ev[2] == [8]
    value = _parse_fields(_parse_fields(ev[5][0])[1][0])
    assert value[1] == [b"render"]
    img = _parse_fields(value[4][0])
    assert img[1] == [4] and img[2] == [6] and img[3] == [3]
    assert img[4][0][:4] == b"\x89PNG"


def test_crc32c_known_vectors():
    """CRC32C test vectors (RFC 3720 appendix + common references)."""
    from neuradar_tpu.utils.tb_writer import _crc32c

    assert _crc32c(b"") == 0x0
    assert _crc32c(b"a") == 0xC1D04330
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_event_writer_tensorboard_mirror(tmp_path):
    from neuradar_tpu.utils.writer import EventWriter

    w = EventWriter(log_dir=tmp_path, verbose=False)
    w.put_scalars(3, {"psnr": 21.5})
    tb_files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(tb_files) == 1
    records = _read_records(tb_files[0])
    assert len(records) >= 2  # header + at least the psnr scalar
