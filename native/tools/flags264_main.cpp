namespace dtv {
int flags264_main(int argc, char** argv);
}

int main(int argc, char** argv) { return dtv::flags264_main(argc, argv); }
