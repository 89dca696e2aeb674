"""Canonical ROS 2 message names/definitions used when rewriting MCAP schemas
(the standard public sensor_msgs / point_cloud_interfaces texts; equivalent of
the reference's ros_message_definitions.hpp)."""

POINTCLOUD_SCHEMA_NAME = "sensor_msgs/msg/PointCloud2"
COMPRESSED_SCHEMA_NAME = "point_cloud_interfaces/msg/CompressedPointCloud2"

_POINTFIELD_AND_HEADER = """\
================================================================================
MSG: sensor_msgs/PointField
uint8 INT8    = 1
uint8 UINT8   = 2
uint8 INT16   = 3
uint8 UINT16  = 4
uint8 INT32   = 5
uint8 UINT32  = 6
uint8 FLOAT32 = 7
uint8 FLOAT64 = 8

string name      # Name of field
uint32 offset    # Offset from start of point struct
uint8  datatype  # Datatype enumeration, see above
uint32 count     # How many elements in the field

================================================================================
MSG: std_msgs/Header
builtin_interfaces/Time stamp
string frame_id

================================================================================
MSG: builtin_interfaces/Time
int32 sec
uint32 nanosec
"""

POINTCLOUD_SCHEMA_DATA = (
    """\
# This message holds a collection of N-dimensional points as a binary blob,
# its layout described by the contents of the "fields" array.
std_msgs/Header header

uint32 height
uint32 width

PointField[] fields

bool    is_bigendian # Is this data bigendian?
uint32  point_step   # Length of a point in bytes
uint32  row_step     # Length of a row in bytes
uint8[] data         # Actual point data, size is (row_step*height)

bool is_dense        # True if there are no invalid points

"""
    + _POINTFIELD_AND_HEADER
)

COMPRESSED_SCHEMA_DATA = (
    """\
# point_cloud_interfaces/msg/CompressedPointCloud2
std_msgs/Header header

uint32 height
uint32 width

sensor_msgs/PointField[] fields

bool is_bigendian

uint32 point_step

uint32 row_step

uint8[] compressed_data

bool is_dense

# compression format used (e.g. draco, zlib, etc.)
string format

"""
    + _POINTFIELD_AND_HEADER
)
