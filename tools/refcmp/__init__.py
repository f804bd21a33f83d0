"""Head-to-head quality harness: run the ACTUAL reference implementation
(/root/reference, torch CPU) and this repo on identical exported data at
identical budgets, and grade both trajectories with the same ATE oracle.

This converts the repo's quality claims from self-graded (synthetic scene
judged by the repo's own tools) to adjudicated (the reference itself is
the baseline system).  iMAP* mode needs no pretrained checkpoint blobs
(ref src/NICE_SLAM.py:56-58 only loads pretrain when nice=True), so the
comparison is runnable on this machine today.

Pieces:
- export.py           synthetic scene -> Replica on-disk layout
                      (ref src/utils/datasets.py:116-137)
- shims/              import shims for reference deps absent from this
                      sandbox (mathutils functional; open3d/skimage/
                      trimesh inert — meshing is disabled for the run)
- ref_driver.py       subprocess entry that runs the reference's own
                      run-path (NICE_SLAM.run with its tracker/mapper
                      processes) on CPU
- ../compare_reference.py  orchestrator -> QUALITY.md
"""
