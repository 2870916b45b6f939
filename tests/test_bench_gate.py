"""Second-headline promotion gate (VERDICT r4 next-step 3).

bench.py promotes the distilled direct sampler to a second headline only when
the weights-free distributional sign-off shows the student giving up <=5% of
the teacher's quality gain over the fresh-init control.
"""
import pytest


def test_signoff_gate_promotes_small_delta():
    import bench

    # r4-shaped numbers: control 21.86 -> teacher 0.41; student within noise
    assert bench.signoff_promotes({
        "teacher_fvd": 0.41, "student_fvd": 0.52,
        "fvd_delta_student_minus_teacher": 0.11, "control_fvd": 21.86,
    })


def test_signoff_gate_rejects_large_delta():
    import bench

    with pytest.raises(ValueError, match="unpromoted"):
        bench.signoff_promotes({
            "teacher_fvd": 0.41, "student_fvd": 3.0,
            "fvd_delta_student_minus_teacher": 2.59, "control_fvd": 21.86,
        })


def test_signoff_gate_rejects_untrained_teacher():
    import bench

    # teacher no better than control: nothing to preserve, nothing to promote
    with pytest.raises(ValueError, match="unpromoted"):
        bench.signoff_promotes({
            "teacher_fvd": 22.0, "student_fvd": 21.9,
            "fvd_delta_student_minus_teacher": -0.1, "control_fvd": 21.86,
        })
