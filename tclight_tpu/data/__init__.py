from tclight_tpu.data.dataparsers import VideoDataParser, make_data_parser
