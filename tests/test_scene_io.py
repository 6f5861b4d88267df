"""Scene I/O: custom geometries (CustomBox), .npz round trips, CLI
--scene-file (scene/io.py)."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.engine import sim
from mri_nanoparticle_simulation_tpu.scene import (BacteriaBox, CustomBox,
                                                   load_cells_csv,
                                                   load_scene, save_scene)


def _params(n_cells=3, **kw):
    return P.small_test_params(num_cells=n_cells, **kw)


CENTERS = np.array([[2.0, 2.0, 2.0], [5.0, 5.0, 5.0], [2.0, 5.5, 3.0]])


class TestCustomBox:
    def test_builds_full_scene_around_given_centers(self):
        p = _params()
        sc = CustomBox(p, CENTERS, seed=1).populate()
        np.testing.assert_array_equal(sc.cells, CENTERS)
        # one point dipole at each center (BacteriaBox.cpp:114-121)
        np.testing.assert_array_equal(sc.mnps[:3, :3], CENTERS)
        assert sc.num_intra_mnps == 3
        assert sc.mnps.shape[0] >= 3          # plus periodic images
        assert sc.waters.shape == (p.num_water, 3)
        # and the scene simulates
        _, cos, _, st = re.run_simulation(sc, p, seed=2,
                                          max_steps=p.sprint_steps)
        assert np.isfinite(cos).all()

    def test_waters_and_images_follow_custom_geometry(self):
        """Waters avoid the PROVIDED cells (AVOID_INTRACELLULAR_THROW
        semantics apply to the custom geometry, not a random one)."""
        p = _params()
        sc = CustomBox(p, CENTERS, seed=1).populate()
        d2 = np.sum((sc.waters[:, None, :] - CENTERS) ** 2, axis=2)
        assert d2.min() >= p.cell_r ** 2

    def test_out_of_bounds_rejected(self):
        p = _params()
        bad = CENTERS.copy()
        bad[0, 0] = p.bound  # sphere pokes out of the box
        with pytest.raises(ValueError, match="inside the box"):
            CustomBox(p, bad)

    def test_count_mismatch_rejected(self):
        with pytest.raises(ValueError, match="num_cells"):
            CustomBox(_params(n_cells=5), CENTERS)

    def test_bad_shape_rejected(self):
        with pytest.raises(ValueError, match=r"\[n, 3\]"):
            CustomBox(_params(), np.zeros((3, 2)))


class TestSceneRoundTrip:
    def test_npz_round_trip_bitwise(self, tmp_path):
        p = _params(n_cells=4)
        sc = BacteriaBox(p, seed=3).populate()
        path = str(tmp_path / "scene.npz")
        save_scene(sc, path)
        sc2 = load_scene(path, p)
        np.testing.assert_array_equal(sc2.cells, sc.cells)
        np.testing.assert_array_equal(sc2.mnps, sc.mnps)
        np.testing.assert_array_equal(sc2.waters, sc.waters)
        np.testing.assert_array_equal(sc2.lookup_table, sc.lookup_table)
        assert sc2.num_intra_mnps == sc.num_intra_mnps
        # identical arrays -> identical curve
        _, c1, _, _ = re.run_simulation(sc, p, seed=2,
                                        max_steps=p.sprint_steps)
        _, c2, _, _ = re.run_simulation(sc2, p, seed=2,
                                        max_steps=p.sprint_steps)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_params_mismatch_guard(self, tmp_path):
        """Geometry-affecting fields are pinned; simulation knobs are
        free — re-running an archived geometry under a new sequence is
        the point of the archive."""
        p = _params(n_cells=4)
        sc = BacteriaBox(p, seed=3).populate()
        path = str(tmp_path / "scene.npz")
        save_scene(sc, path)
        other = p.replace(cell_r=0.4).validate()
        with pytest.raises(ValueError, match="geometry params"):
            load_scene(path, other)
        # a changed SIMULATION knob (taucp) loads under the default
        # strict check — only geometry fields are compared
        sc2 = load_scene(path, p.replace(taucp=0.001).validate())
        np.testing.assert_array_equal(sc2.mnps, sc.mnps)
        # strict off skips even the geometry check
        sc3 = load_scene(path, other, strict_params=False)
        np.testing.assert_array_equal(sc3.mnps, sc.mnps)

    def test_dense_geometry_fails_loudly_not_hangs(self):
        """A geometry covering the whole water sub-cube must raise a
        diagnostic, not spin the rejection loop forever."""
        from mri_nanoparticle_simulation_tpu.scene import CustomBox
        p = _params(n_cells=1, num_water=4).replace(
            cell_r=3.4, water_start_bound=2.0).validate()
        # one giant cell centered on the box: the 2 µm water cube at
        # the box center is entirely intracellular
        center = np.array([[p.bound / 2] * 3])
        box = CustomBox(p, center, seed=1)
        box.MAX_THROWS = 2000
        with pytest.raises(ValueError, match="could not place water"):
            box.populate()

    def test_nan_cells_rejected(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.scene import CustomBox
        bad = CENTERS.copy()
        bad[1, 2] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            CustomBox(_params(), bad)
        f = tmp_path / "bad.csv"
        f.write_text("2,2,2\n5,nan,5\n")
        with pytest.raises(ValueError, match="non-finite"):
            load_cells_csv(str(f))


class TestSceneFingerprint:
    def test_resume_rejects_different_geometry(self, tmp_path):
        """With user geometries, (params, scene_seed) no longer pins
        the scene: the checkpoint's content hash must refuse a resume
        in a different box."""
        from mri_nanoparticle_simulation_tpu.engine.sim import \
            SimulationRunner
        p = _params()
        ckpt = str(tmp_path / "c.npz")
        sc_a = CustomBox(p, CENTERS, seed=1).populate()
        r1 = SimulationRunner(p, scene_seed=1, seed=2, engine="scan",
                              scene=sc_a)
        r1.run(max_steps=p.sprint_steps, checkpoint_path=ckpt)

        other = CENTERS + 0.5
        sc_b = CustomBox(p, other, seed=1).populate()
        r2 = SimulationRunner(p, scene_seed=1, seed=2, engine="scan",
                              scene=sc_b)
        with pytest.raises(ValueError, match="different scene"):
            r2.resume(ckpt)

        # the same geometry resumes fine
        r3 = SimulationRunner(p, scene_seed=1, seed=2, engine="scan",
                              scene=CustomBox(p, CENTERS,
                                              seed=1).populate())
        r3.resume(ckpt)
        assert int(np.asarray(r3.state.step)) == p.sprint_steps


class TestCellsCsvAndCli:
    def test_load_cells_csv(self, tmp_path):
        f = tmp_path / "cells.csv"
        f.write_text("# x,y,z um\n2,2,2\n5,5,5\n")
        cells = load_cells_csv(str(f))
        np.testing.assert_array_equal(cells, [[2, 2, 2], [5, 5, 5]])
        bad = tmp_path / "bad.csv"
        bad.write_text("1,2\n")
        with pytest.raises(ValueError, match="3 columns"):
            load_cells_csv(str(bad))

    def test_cli_scene_file_csv(self, tmp_path):
        """--scene-file cells.csv: num_cells follows the file and the
        run completes end to end."""
        f = tmp_path / "cells.csv"
        np.savetxt(f, CENTERS, delimiter=",")
        out = str(tmp_path / "custom.csv")
        rc = sim.main(["--num-water", "32", "--num-cells", "8",
                       "--totaltime", "0.002", "--sprint-steps", "1000",
                       "--chunk-steps", "100", "--near-k", "3",
                       "--taucp", "0.001", "--hash-dim", "8",
                       "--engine", "scan",
                       "--scene-file", str(f), "--out", out])
        assert rc == 0
        d = np.loadtxt(out, delimiter=",")
        assert d.shape == (2, 2)

    def test_cli_scene_file_excludes_family_and_sweeps(self, tmp_path):
        f = tmp_path / "cells.csv"
        np.savetxt(f, CENTERS, delimiter=",")
        with pytest.raises(SystemExit):
            sim.main(["--scene-file", str(f), "--scene-family", "fcc",
                      "--out", str(tmp_path / "x.csv")])
        with pytest.raises(SystemExit):
            sim.main(["--scene-file", str(f), "--sweep", "taucp",
                      "--sweep-values", "0.001",
                      "--out", str(tmp_path / "x.csv")])


class TestSaveSceneCli:
    """mri-t2-sim --save-scene: archive the run's exact geometry."""

    ARGS = ["--num-water", "32", "--num-cells", "8",
            "--totaltime", "0.002", "--sprint-steps", "1000",
            "--chunk-steps", "100", "--near-k", "3",
            "--taucp", "0.001", "--hash-dim", "8",
            "--engine", "scan", "--seed", "7", "--scene-seed", "5"]

    def test_round_trip_reproduces_run(self, tmp_path):
        """A run re-executed from its own --save-scene archive writes a
        bitwise-identical CSV (the archive IS the geometry)."""
        npz = str(tmp_path / "geom.npz")
        out1 = str(tmp_path / "a.csv")
        assert sim.main(self.ARGS + ["--save-scene", npz,
                                     "--out", out1]) == 0
        out2 = str(tmp_path / "b.csv")
        assert sim.main(self.ARGS + ["--scene-file", npz,
                                     "--out", out2]) == 0
        with open(out1) as f1, open(out2) as f2:
            assert f1.read() == f2.read()

    def test_rejected_for_sweeps(self, tmp_path):
        with pytest.raises(SystemExit):
            sim.main(["--save-scene", str(tmp_path / "g.npz"),
                      "--sweep", "taucp", "--sweep-values", "0.001",
                      "--out", str(tmp_path / "x.csv")])
