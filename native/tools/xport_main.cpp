namespace dtv {
int xport_main(int argc, char** argv);
}

int main(int argc, char** argv) { return dtv::xport_main(argc, argv); }
