"""StageStats counters and reporting format."""

from aether_primitives_tpu.utils.metrics import StageStats


def test_counters_accumulate():
    msgs = []
    st = StageStats("demo", report_every_s=0.0, printer=msgs.append)
    st.record(0.01, samples=100)
    st.record(0.02, samples=200)
    assert st.total_n == 2
    assert st.total_samples == 300
    assert st.total_active_s > 0.029
    assert any("Stage: demo" in m and "Utilisation" in m for m in msgs)


def test_silent_mode():
    st = StageStats("quiet", report_every_s=0.0, printer=None)
    st.record(0.001, samples=1)  # must not raise
    assert st.total_n == 1


def test_window_resets_after_report():
    msgs = []
    st = StageStats("w", report_every_s=0.0, printer=msgs.append)
    st.record(0.001)
    assert st.n == 0  # window counters reset on report
    assert st.total_n == 1
