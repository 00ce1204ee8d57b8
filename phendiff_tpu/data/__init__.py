from phendiff_tpu.data.imagefolder import (  # noqa: F401
    DatasetIndex,
    ImageFolderLoader,
    LoaderConfig,
    balanced_subsample,
    load_image,
    scan_imagefolder,
)
