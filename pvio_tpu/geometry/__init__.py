from pvio_tpu.geometry import lie, camera, triangulation, homography, essential, wahba
