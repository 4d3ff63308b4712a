"""Experiment-tracking tests: log line format, parsing, CSV mirror."""

import io

from diffusion_image_captioning_tpu import logging_utils as lg
from diffusion_image_captioning_tpu.config import Config, model_name

# A real epoch line from the reference's best-model log (data, not code) —
# the parser must handle both frameworks' lines identically.
REFERENCE_LINE = (
    "epoch 14 average x_t_loss, x_1_loss, prob_loss, val losses: "
    "4.577733516693115, 3.6373050212860107, 11.583418846130371, "
    "4.530128002166748, 3.5788822174072266, 12.940613746643066\n"
)


class TestParsing:
    def test_extract_floats(self):
        vals = lg.extract_floats("a 1.5 b -2 c 3e-4")
        assert vals == [1.5, -2.0, 3e-4]

    def test_parse_reference_line(self, tmp_path):
        p = tmp_path / "log.txt"
        p.write_text("header\n" + REFERENCE_LINE + "early stop! \n")
        rows = lg.parse_epoch_lines(str(p))
        assert len(rows) == 1
        assert rows[0]["epoch"] == 14
        assert rows[0]["train_x_t"] == 4.577733516693115
        assert rows[0]["val_prob"] == 12.940613746643066


class TestSummary:
    def test_writes_codec_named_file(self, tmp_path):
        cfg = Config()
        s = lg.Summary(cfg, str(tmp_path))
        s.write("hello\n")
        s.close()
        expected = tmp_path / f"{model_name(cfg)}.txt"
        assert expected.exists()
        assert expected.read_text() == "hello\n"

    def test_append_mode(self, tmp_path):
        cfg = Config()
        for text in ("a\n", "b\n"):
            s = lg.Summary(cfg, str(tmp_path))
            s.write(text)
            s.close()
        assert (tmp_path / f"{model_name(cfg)}.txt").read_text() == "a\nb\n"

    def test_csv_mirror(self, tmp_path):
        cfg = Config()
        s = lg.Summary(cfg, str(tmp_path))
        s.epoch_row({"epoch": 0, "train_x_t": 1.0})
        s.epoch_row({"epoch": 1, "train_x_t": 2.0})
        s.close()
        lines = (tmp_path / f"{model_name(cfg)}.csv").read_text().splitlines()
        assert lines[0] == "epoch,train_x_t"
        assert lines[1] == "0,1.0"
        assert len(lines) == 3

    def test_stream_override(self):
        buf = io.StringIO()
        s = lg.Summary(Config(), stream=buf, csv_mirror=False)
        s.write("x")
        assert buf.getvalue() == "x"
