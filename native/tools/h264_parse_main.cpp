namespace dtv {
int h264_dump_main(int argc, char** argv);
}

int main(int argc, char** argv) { return dtv::h264_dump_main(argc, argv); }
