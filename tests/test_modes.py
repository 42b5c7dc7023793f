"""Mode breadth: encode->decode parity across the operating-mode table.

Covers both polar codes (64800/64512), both constellations (QPSK/8PSK)
and the carrier-count extremes through the batched pipeline (BASELINE
config 3's sweep, sampled to keep CPU test time sane; mode 6 gets the
full interactive-decoder treatment in test_loopback.py).
"""

import numpy as np
import pytest

from modem_tpu import bits as B
from modem_tpu.encoder import Encoder
from modem_tpu.numerology import make_config
from modem_tpu.pipeline import BatchPipeline

# mode 6: 8PSK/64800/432 cols; 8: QPSK/64800; 10: 8PSK/64512/512 cols;
# 13: QPSK/64512/256 cols (the extremes of the table)
SAMPLED_MODES = [6, 8, 10, 13]


@pytest.mark.parametrize("mode", SAMPLED_MODES)
def test_mode_loopback_pipeline(mode):
    cfg = make_config(8000, mode, 2000)
    enc = Encoder(cfg)
    rng = np.random.default_rng(mode)
    payload = rng.integers(0, 256, cfg.mode.data_bytes,
                           dtype=np.uint8).tobytes()
    wave, _ = enc.encode(payload, B.base37_encode("N0CALL"))
    sil = np.zeros(cfg.rate // 4, dtype=np.complex64)
    rec = np.concatenate([sil, wave, sil])[None, :]

    pipe = BatchPipeline(8000, mode)
    res = pipe.decode_batch(rec)
    assert bool(np.asarray(res["ok"])[0])
    assert int(np.asarray(res["flips"])[0]) == 0
    assert pipe.payload_bytes(res, 0) == payload


def test_mode_table_consistency():
    """Derived numbers must match the documented table (SURVEY.md §2.2)."""
    from modem_tpu.numerology import MODES
    rows = {6: 50, 7: 54, 8: 81, 9: 90, 10: 42, 11: 56, 12: 84, 13: 126}
    for m, want in rows.items():
        assert MODES[m].cons_rows == want
        assert MODES[m].cons_bits % MODES[m].mod_bits == 0
        assert MODES[m].cons_cnt % MODES[m].cons_cols == 0
