"""Dataset IO: synthetic sequence generation, EuRoC loading, TUM trajectories.

Replaces the reference's rosbag/ROS-topic ingestion (ros/src/ClientNode.cc
image callbacks) with plain array loaders.
"""
