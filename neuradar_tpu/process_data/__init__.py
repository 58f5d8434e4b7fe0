"""Dataset ingestion: external capture formats -> transforms.json.

cf. reference nerfstudio/process_data/ (~2.5k LoC). The reference's images/
video paths shell out to COLMAP/ffmpeg, which do not exist in this image, so
this package covers everything that is pure parsing:

* polycam / record3d / metashape / realitycapture / ODM capture exports
  (JSON / XML / CSV conversion math ported from the respective *_utils.py),
* existing COLMAP sparse models (binary cameras.bin/images.bin and text
  cameras.txt/images.txt readers + the OpenCV->OpenGL->world flip from
  colmap_utils.colmap_to_json:419-441),
* image copy + power-of-two downscales (PIL replaces the ffmpeg resize
  pipeline of process_data_utils.downscale_images),
* video frame extraction via cv2 (process_data_utils.convert_video_to_images
  minus the ffmpeg dependency) and equirectangular -> perspective crops
  (equirect_utils.equirect2persp + the 8/14 sampling layouts) in
  video_equirect.py.

COLMAP pose ESTIMATION (feature matching / mapping) still needs the colmap
binary and remains out of scope; existing sparse models are fully readable.

The output transforms.json is consumed by
data/dataparsers/nerfstudio_format.py (and stock nerfstudio alike).
"""

from neuradar_tpu.process_data.converters import (  # noqa: F401
    colmap_to_json,
    copy_and_downscale_images,
    metashape_to_json,
    odm_to_json,
    polycam_to_json,
    read_colmap_cameras,
    read_colmap_images,
    realitycapture_to_json,
    record3d_to_json,
)
from neuradar_tpu.process_data.video_equirect import (  # noqa: F401
    equirect_to_perspective,
    equirect_yaw_pitch_pairs,
    generate_planar_projections,
    video_to_images,
)
