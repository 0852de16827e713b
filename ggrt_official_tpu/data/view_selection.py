"""Source-view selection (host-side numpy).

Parity target: /root/reference/ggrt/data_loaders/data_utils.py:290-328
(get_nearest_pose_ids with matrix/vector/dist metrics).
"""
from __future__ import annotations

import numpy as np

TINY_NUMBER = 1e-6


def angular_dist_between_2_vectors(vec1, vec2):
    vec1_unit = vec1 / (np.linalg.norm(vec1, axis=1, keepdims=True) + TINY_NUMBER)
    vec2_unit = vec2 / (np.linalg.norm(vec2, axis=1, keepdims=True) + TINY_NUMBER)
    angular_dists = np.arccos(np.clip(np.sum(vec1_unit * vec2_unit, axis=-1), -1.0, 1.0))
    return angular_dists


def batched_angular_dist_rot_matrix(R1, R2):
    """Angular distance between batches of rotation matrices."""
    return np.arccos(
        np.clip(
            (np.trace(np.matmul(R2.transpose(0, 2, 1), R1), axis1=1, axis2=2) - 1) / 2.0,
            -1 + TINY_NUMBER,
            1 - TINY_NUMBER,
        )
    )


def get_nearest_pose_ids(
    tar_pose,
    ref_poses,
    num_select,
    tar_id=-1,
    angular_dist_method="vector",
    scene_center=(0, 0, 0),
):
    """Select the `num_select` reference views nearest to the target pose.

    tar_pose: (4, 4) c2w; ref_poses: (n, 4, 4) c2w.
    """
    num_cams = len(ref_poses)
    num_select = min(num_select, num_cams - 1)
    batched_tar_pose = tar_pose[None, ...].repeat(num_cams, 0)

    if angular_dist_method == "matrix":
        dists = batched_angular_dist_rot_matrix(
            batched_tar_pose[:, :3, :3], ref_poses[:, :3, :3]
        )
    elif angular_dist_method == "vector":
        tar_cam_locs = batched_tar_pose[:, :3, 3]
        ref_cam_locs = ref_poses[:, :3, 3]
        scene_center = np.array(scene_center)[None, ...]
        tar_vectors = tar_cam_locs - scene_center
        ref_vectors = ref_cam_locs - scene_center
        dists = angular_dist_between_2_vectors(tar_vectors, ref_vectors)
    elif angular_dist_method == "dist":
        tar_cam_locs = batched_tar_pose[:, :3, 3]
        ref_cam_locs = ref_poses[:, :3, 3]
        dists = np.linalg.norm(tar_cam_locs - ref_cam_locs, axis=1)
    else:
        raise ValueError(f"unknown angular_dist_method: {angular_dist_method}")

    if tar_id >= 0:
        assert tar_id < num_cams
        dists[tar_id] = 1e3  # never select the target itself

    sorted_ids = np.argsort(dists)
    return sorted_ids[:num_select]


def get_nearby_view_ids(
    target_id: int,
    graph,
    idx_to_node_id: dict,
    node_id_to_idx: dict,
    num_select: int,
):
    """View-graph-based source selection (ref data_utils.py:329-352).

    `graph` is any adjacency with `neighbors(node)` and edge weights
    accessible as graph[u][v]['weight'] (networkx-compatible); higher weight
    = stronger covisibility = higher priority.
    """
    import heapq

    target_node_id = idx_to_node_id[target_id]
    heap = []
    for j in graph.neighbors(target_node_id):
        if j not in node_id_to_idx:
            continue
        priority = int((1.0 / graph[target_node_id][j]["weight"]) * 1e5)
        heapq.heappush(heap, (priority, j))

    select_ids = []
    while heap and len(select_ids) < num_select:
        _, node = heapq.heappop(heap)
        select_ids.append(node_id_to_idx[node])
    return np.array(select_ids)
