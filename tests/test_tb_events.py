"""Golden test for the TF-free TensorBoard event reader (VERDICT r2 item 6).

The event file is written by TENSORFLOW'S OWN summary path (the same
``tf.compat.v1.summary.text(tf.as_string(confusion))`` call the reference
uses, `classify/monitored_session_runner.py:22`), then read back with
`hypelcnn_tpu.utils.tb_events` (no TF) and cross-checked against the
reference's ``read_summary_file`` run as a subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF_UTILITIES = "/root/reference/utilities"

CONF_A = np.array([[41, 2, 0], [3, 57, 1], [0, 4, 66]])
CONF_B = np.array([[39, 4, 0], [1, 60, 0], [2, 2, 66]])


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    """runs/exp1/<event file> written by TF's own FileWriter."""
    base = tmp_path_factory.mktemp("runs") / "exp1"
    base.mkdir()
    g = tf.Graph()
    with g.as_default():
        conf_ph = tf.compat.v1.placeholder(tf.int64, shape=[3, 3])
        acc_ph = tf.compat.v1.placeholder(tf.float32, shape=[])
        text_op = tf.compat.v1.summary.text("validation_confusion",
                                            tf.as_string(conf_ph))
        scalar_op = tf.compat.v1.summary.scalar("validation_overall_accuracy",
                                                acc_ph)
        merged = tf.compat.v1.summary.merge([text_op, scalar_op])
        writer = tf.compat.v1.summary.FileWriter(str(base), graph=g)
        with tf.compat.v1.Session(graph=g) as sess:
            for step, (conf, acc) in enumerate([(CONF_A, 0.91), (CONF_B, 0.93)],
                                               start=100):
                writer.add_summary(sess.run(merged, {conf_ph: conf,
                                                     acc_ph: acc}), step)
        writer.close()
    return str(base)


class TestTbEventsReader:
    def test_extracts_confusions_without_tf(self, event_dir, tmp_path):
        from hypelcnn_tpu.utils.tb_events import extract_confusions
        results = extract_confusions(event_dir, output_dir=str(tmp_path))
        assert [step for step, _, _ in results] == [100, 101]
        np.testing.assert_array_equal(results[0][2], CONF_A)
        np.testing.assert_array_equal(results[1][2], CONF_B)
        for _, csv_path, matrix in results:
            assert os.path.exists(csv_path)
            np.testing.assert_array_equal(
                np.loadtxt(csv_path, dtype=int, delimiter=","), matrix)

    def test_step_filter(self, event_dir, tmp_path):
        from hypelcnn_tpu.utils.tb_events import extract_confusions
        results = extract_confusions(event_dir, filtered_steps=[101],
                                     output_dir=str(tmp_path))
        assert [step for step, _, _ in results] == [101]

    def test_scalars(self, event_dir):
        from hypelcnn_tpu.utils.tb_events import read_scalars
        scalars = read_scalars(event_dir)
        vals = dict(scalars["validation_overall_accuracy"])
        assert vals[100] == pytest.approx(0.91)
        assert vals[101] == pytest.approx(0.93)

    def test_crc_rejects_corruption(self, event_dir, tmp_path):
        import glob as _glob
        from hypelcnn_tpu.utils.tb_events import extract_confusions
        src = _glob.glob(os.path.join(event_dir, "event*"))[0]
        data = bytearray(open(src, "rb").read())
        data[len(data) // 2] ^= 0xFF  # flip a payload byte
        bad_dir = tmp_path / "bad"
        bad_dir.mkdir()
        (bad_dir / os.path.basename(src)).write_bytes(bytes(data))
        # corrupt tail is skipped, not fatal (reference DataLossError parity)
        results = extract_confusions(str(bad_dir), output_dir=str(tmp_path))
        assert len(results) < 2

    @pytest.mark.skipif(not os.path.isdir(REF_UTILITIES),
                        reason="reference checkout not present")
    def test_matches_reference_reader(self, event_dir, tmp_path):
        code = (
            "import numpy, sys;"
            "numpy.int = getattr(numpy, 'int', int);"
            "numpy.float = getattr(numpy, 'float', float);"
            f"sys.path.insert(0, {REF_UTILITIES!r});"
            f"sys.argv = ['read_summary_file', {event_dir!r}];"
            "import read_summary_file; read_summary_file.main()"
        )
        ref = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=300, cwd=str(tmp_path))
        assert ref.returncode == 0, ref.stderr
        ref_csvs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".csv"))
        assert len(ref_csvs) == 2

        ours_dir = tmp_path / "ours"
        ours_dir.mkdir()
        from hypelcnn_tpu.utils.tb_events import extract_confusions
        results = extract_confusions(event_dir, output_dir=str(ours_dir))
        our_csvs = sorted(os.listdir(ours_dir))
        assert our_csvs == ref_csvs  # same <parent>_<dir>_s<step>.csv naming
        for name in ref_csvs:
            np.testing.assert_array_equal(
                np.loadtxt(tmp_path / name, dtype=int, delimiter=","),
                np.loadtxt(ours_dir / name, dtype=int, delimiter=","))
