"""SectorArea tests (utility/sector_area.h:26-149 role)."""

import numpy as np
import pytest

from pvio_tpu.map import sector_area as sa


@pytest.fixture
def basis():
    return np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])


def disk_points(rng, n, r, center=(0, 0)):
    ang = rng.uniform(-np.pi, np.pi, n)
    rad = r * np.sqrt(rng.uniform(0, 1, n))
    return np.stack([center[0] + rad * np.cos(ang),
                     center[1] + rad * np.sin(ang),
                     np.zeros(n)], axis=-1)


def test_insert_tracks_max_radius(rng, basis):
    a = sa.SectorArea.empty(np.zeros(3), basis)
    a = sa.insert(a, disk_points(rng, 400, 2.0))
    assert (a.radii > 1.5).all()
    assert (a.radii <= 2.0 + 1e-9).all()


def test_near_boundary_gate(rng, basis):
    a = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                  disk_points(rng, 400, 2.0))
    assert sa.is_near_boundary(a, np.array([1.0, 0.0, 0.0]))
    assert sa.is_near_boundary(a, np.array([2.3, 0.0, 0.0]))  # ratio 1.2
    assert not sa.is_near_boundary(a, np.array([3.5, 0.0, 0.0]))


def test_merge_covers_union(rng, basis):
    a = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                  disk_points(rng, 300, 1.0))
    b = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                  disk_points(rng, 300, 1.0, center=(2.5, 0.0)))
    m = sa.merge(a, b)
    # a point near b's far side is now near the merged boundary
    assert sa.is_near_boundary(m, np.array([3.2, 0.0, 0.0]))


def test_centralize_moves_center(rng, basis):
    a = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                  disk_points(rng, 400, 1.0, center=(3.0, 0.0)))
    pts = disk_points(rng, 400, 1.0, center=(3.0, 0.0))
    a = sa.insert(sa.SectorArea.empty(np.zeros(3), basis), pts)
    c = sa.centralize(a, points=pts)
    # the new center comes from boundary vertices, landing in the cluster
    assert c.center[0] > 1.5
    assert sa.is_near_boundary(c, np.array([3.0, 0.5, 0.0]))


def test_overlap_ratio(rng, basis):
    a = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                  disk_points(rng, 400, 2.0))
    b_inside = sa.insert(sa.SectorArea.empty(np.zeros(3), basis),
                         disk_points(rng, 200, 0.8))
    b_far = sa.insert(sa.SectorArea.empty(np.array([10.0, 0, 0]), basis),
                      disk_points(rng, 200, 0.8, center=(10.0, 0.0)))
    assert sa.overlap_ratio(a, b_inside) > 0.9
    assert sa.overlap_ratio(a, b_far) < 0.2
