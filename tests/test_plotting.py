"""mri-t2-plot: decay-curve and dispersion-table figures (plotting.py)."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import plotting


def _curve_csv(path, t2=0.01, w=64):
    t = np.linspace(0.001, 0.02, 20)
    np.savetxt(path, np.c_[t, w * np.exp(-t / t2)], delimiter=",")
    return str(path)


def _table_csv(path):
    path.write_text(
        "D,taucp,r2_per_ms,t2_ms,r_squared,n_echoes\n"
        "0.25,2.5,0.023,42.4,0.999,8\n"
        "1,2.5,0.053,18.8,0.999,8\n"
        "0.25,5.5,0.025,39.3,0.999,3\n"
        "1,5.5,nan,nan,nan,0\n")
    return str(path)


class TestCurves:
    def test_writes_png(self, tmp_path):
        c1 = _curve_csv(tmp_path / "a.csv", 0.01)
        c2 = _curve_csv(tmp_path / "b.csv", 0.005)
        out = str(tmp_path / "curves.png")
        assert plotting.main([c1, c2, "--out", out, "--num-water", "64",
                              "--title", "decay"]) == 0
        assert (tmp_path / "curves.png").stat().st_size > 10_000

    def test_single_curve_no_legend(self, tmp_path):
        c1 = _curve_csv(tmp_path / "a.csv")
        out = str(tmp_path / "one.png")
        assert plotting.main([c1, "--out", out, "--logy"]) == 0
        assert (tmp_path / "one.png").stat().st_size > 5_000

    def test_palette_slots_enforced(self, tmp_path):
        """Hues are never generated or cycled: more curves than slots is
        an error, not an improvised palette."""
        paths = [_curve_csv(tmp_path / f"c{i}.csv") for i in range(8)]
        with pytest.raises(ValueError, match="palette"):
            plotting.plot_curves(paths, str(tmp_path / "x.png"))


class TestDispersion:
    def test_writes_png_and_drops_nan(self, tmp_path):
        tbl = _table_csv(tmp_path / "t.csv")
        out = str(tmp_path / "disp.png")
        assert plotting.main([tbl, "--table", "--out", out]) == 0
        assert (tmp_path / "disp.png").stat().st_size > 10_000

    def test_t2_column(self, tmp_path):
        tbl = _table_csv(tmp_path / "t.csv")
        out = str(tmp_path / "t2.png")
        assert plotting.main([tbl, "--table", "--ycol", "t2_ms",
                              "--out", out]) == 0

    def test_table_wants_one_input(self, tmp_path):
        tbl = _table_csv(tmp_path / "t.csv")
        with pytest.raises(SystemExit):
            plotting.main([tbl, tbl, "--table",
                           "--out", str(tmp_path / "x.png")])

    def test_fit_r2_schema_uses_dense_axis(self, tmp_path):
        """--fit-r2 tables lead with a constant mscale column; the x
        axis must be the DENSE knob (taucp_ms), not the first one —
        otherwise every echo spacing collapses into a one-point series
        at x=mscale."""
        tbl = tmp_path / "r2.csv"
        tbl.write_text(
            "mscale,taucp_ms,r2_per_ms,t2_ms,r_squared,n_echoes\n"
            "1,2.5,0.023,42.4,0.999,8\n"
            "1,5.5,0.025,39.3,0.999,3\n"
            "1,11,0.027,37.0,0.99,1\n")
        out = str(tmp_path / "r2.png")
        plotting.plot_dispersion(str(tbl), out)
        # one series (single mscale) spanning the three taucp points —
        # with mscale as x it would have been 3 one-point series and
        # >7 spacings would even trip the palette guard
        assert (tmp_path / "r2.png").stat().st_size > 10_000

    def test_bad_column_rejected(self, tmp_path):
        tbl = str(tmp_path / "bad.csv")
        open(tbl, "w").write("a,b\n1,2\n")
        with pytest.raises(ValueError, match="not in"):
            plotting.plot_dispersion(tbl, str(tmp_path / "x.png"))

    def test_stderr_column_draws_error_bars(self, tmp_path):
        """Newer tables carry t2_stderr_ms: it must be treated as a fit
        column (NOT a knob/series axis) and rendered as error bars for
        t2_ms / propagated for r2_per_ms; nan stderr rows still plot."""
        tbl = tmp_path / "e.csv"
        tbl.write_text(
            "D,r2_per_ms,t2_ms,r_squared,n_echoes,t2_stderr_ms\n"
            "0.25,0.023,42.4,0.999,8,1.2\n"
            "0.5,0.035,28.3,0.999,8,nan\n"
            "1,0.053,18.8,0.999,8,0.6\n")
        for ycol in ("t2_ms", "r2_per_ms"):
            out = tmp_path / f"{ycol}.png"
            plotting.plot_dispersion(str(tbl), str(out), ycol=ycol)
            assert out.stat().st_size > 10_000


class TestMagnitudeCurves:
    def test_magnitude_trace(self, tmp_path):
        t = np.linspace(0.001, 0.02, 20)
        mag = 64 * np.exp(-t / 0.01)
        path = tmp_path / "q.csv"
        np.savetxt(path, np.c_[t, mag * np.cos(300 * t),
                               mag * np.sin(300 * t)], delimiter=",")
        out = str(tmp_path / "m.png")
        assert plotting.main([str(path), "--magnitude", "--out", out,
                              "--num-water", "64"]) == 0
        assert (tmp_path / "m.png").stat().st_size > 5_000
        # cos-only CSVs are rejected with a clear error
        c2 = _curve_csv(tmp_path / "c.csv")
        with pytest.raises(ValueError, match="quadrature"):
            plotting.plot_curves([c2], str(tmp_path / "x.png"),
                                 magnitude=True)
        with pytest.raises(SystemExit):
            plotting.main([str(path), "--table", "--magnitude",
                           "--out", out])


class TestScenePlot:
    """mri-t2-plot --scene: geometry render from a scene archive (the
    reference's simulation_stats.csv eyeball workflow, productized)."""

    @staticmethod
    def _scene_npz(tmp_path):
        from mri_nanoparticle_simulation_tpu.params import \
            small_test_params
        from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
        from mri_nanoparticle_simulation_tpu.scene.io import save_scene
        p = small_test_params(num_water=48)
        sc = BacteriaBox(p, seed=3).populate()
        return save_scene(sc, str(tmp_path / "scene.npz"))

    def test_writes_png(self, tmp_path):
        npz = self._scene_npz(tmp_path)
        out = str(tmp_path / "scene.png")
        assert plotting.main([npz, "--scene", "--out", out]) == 0
        assert (tmp_path / "scene.png").stat().st_size > 10_000

    def test_dark_and_default_title(self, tmp_path):
        npz = self._scene_npz(tmp_path)
        out = str(tmp_path / "scene_dark.png")
        assert plotting.plot_scene(npz, out, dark=True) == out
        assert (tmp_path / "scene_dark.png").stat().st_size > 10_000

    def test_non_scene_npz_rejected(self, tmp_path):
        bad = tmp_path / "bad.npz"
        np.savez(bad, a=np.zeros(3))
        with pytest.raises(ValueError, match="not a scene archive"):
            plotting.plot_scene(str(bad), str(tmp_path / "x.png"))

    def test_scene_excludes_other_modes(self, tmp_path):
        npz = self._scene_npz(tmp_path)
        with pytest.raises(SystemExit):
            plotting.main([npz, "--scene", "--table",
                           "--out", str(tmp_path / "x.png")])
        with pytest.raises(SystemExit):
            plotting.main([npz, "--scene", "--magnitude",
                           "--out", str(tmp_path / "x.png")])

    def test_walker_subsampling(self, tmp_path):
        """max_waters caps the dots deterministically (legibility at
        scale-up walker counts)."""
        npz = self._scene_npz(tmp_path)
        out = str(tmp_path / "sub.png")
        assert plotting.plot_scene(npz, out, max_waters=10) == out


class TestSpectrumPlot:
    """mri-t2-plot --spectrum: T2-spectrum tables over a log axis."""

    @staticmethod
    def _spectrum_csv(path):
        t2 = np.geomspace(0.5, 100, 48)
        w = np.exp(-0.5 * ((np.log(t2) - np.log(8.0)) / 0.3) ** 2)
        with open(path, "w") as f:
            f.write("t2_ms,weight\n")
            for a, b in zip(t2, w):
                f.write(f"{a},{b}\n")
        return str(path)

    def test_writes_png(self, tmp_path):
        s1 = self._spectrum_csv(tmp_path / "a.csv")
        s2 = self._spectrum_csv(tmp_path / "b.csv")
        out = str(tmp_path / "spec.png")
        assert plotting.main([s1, s2, "--spectrum", "--out", out,
                              "--title", "T2 spectrum"]) == 0
        assert (tmp_path / "spec.png").stat().st_size > 10_000

    def test_rejects_non_spectrum_table(self, tmp_path):
        bad = tmp_path / "bad.csv"
        bad.write_text("a,b\n1,2\n")
        with pytest.raises(ValueError, match="not a spectrum table"):
            plotting.plot_spectrum([str(bad)], str(tmp_path / "x.png"))

    def test_modes_exclusive(self, tmp_path):
        s1 = self._spectrum_csv(tmp_path / "a.csv")
        with pytest.raises(SystemExit):
            plotting.main([s1, "--spectrum", "--table",
                           "--out", str(tmp_path / "x.png")])
