namespace dtv {
int l1dump_main(int argc, char** argv);
}

int main(int argc, char** argv) { return dtv::l1dump_main(argc, argv); }
