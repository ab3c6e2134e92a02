"""TensorBoard event-file writer: verify real TB tooling can read it.

Parity target: the reference's rank-0 `tensorboard_logger` scalar stream
(train_teacher.py:228,265-303).
"""

import glob
import os
import struct

import pytest

from moma_tpu.core.tb_writer import TBWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tfrecord_framing(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar("train/loss", 1.5, step=3)
    w.close()
    raw = open(w.path, "rb").read()
    off = 0
    records = []
    while off < len(raw):
        (length,) = struct.unpack_from("<Q", raw, off)
        (hcrc,) = struct.unpack_from("<I", raw, off + 8)
        assert hcrc == _masked_crc(raw[off : off + 8])
        payload = raw[off + 12 : off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", raw, off + 12 + length)
        assert pcrc == _masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    assert len(records) == 2  # file_version + 1 scalar
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]


def test_tensorboard_reads_back(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    w = TBWriter(str(tmp_path))
    w.scalar("train/acc", 73.25, step=1)
    w.scalar("train/acc", 80.5, step=2)
    w.scalars(5, lr=0.05, loss=2.0)
    w.close()
    events = list(tb.LegacyEventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            scalars[(v.tag, ev.step)] = v.simple_value
    assert scalars[("train/acc", 1)] == 73.25
    assert scalars[("train/acc", 2)] == 80.5
    assert scalars[("lr", 5)] == pytest.approx(0.05)
    assert scalars[("loss", 5)] == 2.0


def test_statswriter_emits_tb(tmp_path):
    from moma_tpu.core.checkpoint import StatsWriter

    s = StatsWriter(str(tmp_path))
    s.scalar(1, loss=0.5)
    s.update_epoch(1, {"train_acc": 50.0, "note": "text-skipped"})
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    assert os.path.getsize(files[0]) > 0
